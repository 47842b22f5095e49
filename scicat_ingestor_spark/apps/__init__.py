"""Runnable entry points mirroring the reference's three executables
(/root/reference/pyproject.toml:80-88): online daemon, offline one-shot
ingestor, sample-ingestor daemon — each a thin wiring of the compiled
batch core into batch or streaming shells."""
