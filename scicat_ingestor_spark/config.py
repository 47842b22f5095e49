"""Engine configuration: nested dataclasses merged from YAML + CLI.

Mirrors the reference's config plane
(/root/reference/src/scicat_configuration.py:202-537): typed nested
dataclasses, a YAML file supplies defaults, CLI overrides win (:511-537),
and config keys that match no known field are collected and warned
about rather than rejected (:489-499 — the §2.8 unused-key set
difference). Config is driver-side only; nothing here touches the data
plane.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field, fields
from typing import Any


@dataclass
class KafkaConfig:
    bootstrap_servers: str = "localhost:9092"
    topics: str = "wrdn"  # comma list, as the reference's multi-topic option
    starting_offsets: str = "earliest"  # T7 auto_offset_reset
    individual_message_commit: bool = True  # T2
    # SASL/SSL passthrough, same option names as the reference
    # (/root/reference/src/scicat_kafka.py:21-53)
    security_protocol: str = ""
    sasl_mechanism: str = ""
    sasl_username: str = ""
    sasl_password: str = ""  # redacted in to_public_dict


@dataclass
class FileHandlingConfig:
    data_directory: str = ""
    open_max_tries: int = 3  # T6
    open_retry_delay_s: float = 3.0  # clamped [1, 120] at use site
    # per-attempt delay list (T6); wins over the scalar when non-empty.
    # Reference fill/truncate semantics
    # (/root/reference/src/scicat_configuration.py:296-309): shorter than
    # max_tries extends with the last value, longer truncates.
    open_retry_delays: list = field(default_factory=list)

    def retry_schedule(self) -> list[float]:
        from scicat_ingestor_spark.sources.hdf5 import resolve_retry_delays

        return resolve_retry_delays(
            self.open_retry_delays or self.open_retry_delay_s, self.open_max_tries
        )
    compute_file_hash: bool = True
    file_hash_algorithm: str = "blake2b"  # only value the reference allows
    message_to_file: bool = True


@dataclass
class IngestionConfig:
    schemas_directory: str = ""
    dry_run: bool = False
    max_offsets_per_trigger: int = 10_000  # T3 bounded work per micro-batch
    # replay-source twin of max_offsets_per_trigger: files per
    # micro-batch for --source-dir runs (0 = drain all at once). The
    # soak test uses 1 to force one micro-batch per replay file.
    max_files_per_trigger: int = 0
    file_handling: FileHandlingConfig = field(default_factory=FileHandlingConfig)
    # daemon-loop resilience (reference system_helpers parity): restart
    # the stream on transient failures, at most max_stream_restarts
    # times within stream_restart_window_s, backoff between attempts
    max_stream_restarts: int = 5
    stream_restart_window_s: float = 600.0
    stream_restart_backoff_s: float = 2.0


@dataclass
class SciCatConfig:
    host: str = ""
    token: str = ""  # redacted in to_public_dict
    timeout_s: float = 10.0
    dimension_snapshot_dir: str = ""  # parquet snapshots of catalog resources
    # sink mode: "snapshot" appends to parquet tables (offline/dev),
    # "live" POSTs to the catalog from foreachBatch (streaming/rest_sink)
    sink_mode: str = "snapshot"
    post_retries: int = 3
    post_retry_delay_s: float = 0.5
    # live-refresh the dimension snapshots from `host` every N
    # micro-batches (0 = snapshot-only; see streaming/dim_refresh). The
    # parquet snapshots stay the bootstrap + schema source either way.
    snapshot_refresh_batches: int = 0

    def rest_sink_config(self, endpoint: str = "datasets"):
        """The live-mode sink config for this catalog connection."""
        from scicat_ingestor_spark.streaming.rest_sink import RestSinkConfig

        return RestSinkConfig(
            base_url=self.host,
            endpoint=endpoint,
            token=self.token,
            timeout_s=self.timeout_s,
            retries=self.post_retries,
            retry_delay_s=self.post_retry_delay_s,
        )


@dataclass
class HealthCheckConfig:
    enabled: bool = False
    host: str = "127.0.0.1"
    port: int = 8080
    stale_after_s: float = 60.0


@dataclass
class StreamingConfig:
    checkpoint_dir: str = ""
    trigger_processing_time: str = "1 second"  # T1 cadence
    available_now: bool = False


@dataclass
class EngineConfig:
    kafka: KafkaConfig = field(default_factory=KafkaConfig)
    ingestion: IngestionConfig = field(default_factory=IngestionConfig)
    scicat: SciCatConfig = field(default_factory=SciCatConfig)
    health_check: HealthCheckConfig = field(default_factory=HealthCheckConfig)
    streaming: StreamingConfig = field(default_factory=StreamingConfig)
    # reference LoggingOptions block
    # (/root/reference/src/scicat_configuration.py:203-223); build the
    # actual logger with logging_setup.build_logger(cfg.logging)
    logging: "LoggingOptions" = field(default_factory=lambda: _logging_options())


def _logging_options():
    from scicat_ingestor_spark.logging_setup import LoggingOptions

    return LoggingOptions()


def _apply(obj: Any, data: dict, prefix: str, unused: list[str]) -> None:
    known = {f.name: f for f in fields(obj)}
    for key, value in (data or {}).items():
        f = known.get(key)
        if f is None:
            unused.append(f"{prefix}{key}")
            continue
        current = getattr(obj, key)
        if dataclasses.is_dataclass(current):
            if isinstance(value, dict):
                _apply(current, value, f"{prefix}{key}.", unused)
            else:
                unused.append(f"{prefix}{key}")
        else:
            setattr(obj, key, _coerce(current, value))


def _coerce(current: Any, value: Any) -> Any:
    """Typed-field coercion, like the dataclass-reflection argparse in the
    reference (/root/reference/src/scicat_configuration.py:119-186)."""
    if isinstance(current, bool) and isinstance(value, str):
        return value.lower() in ("1", "true", "yes")
    if current is not None and value is not None and not isinstance(value, type(current)):
        try:
            return type(current)(value)
        except (TypeError, ValueError):
            return value
    return value


def build_config(
    yaml_path: str | None = None,
    overrides: dict[str, Any] | None = None,
) -> tuple[EngineConfig, list[str]]:
    """YAML file -> defaults; ``overrides`` (dot-keyed, e.g. from CLI
    ``--set kafka.topics=a,b``) win, like the reference's CLI-over-YAML
    merge. Returns (config, unused_keys) — unused keys are reported, not
    fatal (/root/reference/src/scicat_configuration.py:489-499)."""
    cfg = EngineConfig()
    unused: list[str] = []
    if yaml_path:
        import yaml

        data = yaml.safe_load(open(yaml_path).read()) or {}
        _apply(cfg, data, "", unused)
    for dotted, value in (overrides or {}).items():
        obj = cfg
        parts = dotted.split(".")
        ok = True
        for part in parts[:-1]:
            if not hasattr(obj, part):
                ok = False
                break
            obj = getattr(obj, part)
        if not ok or not hasattr(obj, parts[-1]):
            unused.append(dotted)
            continue
        setattr(obj, parts[-1], _coerce(getattr(obj, parts[-1]), value))
    return cfg, unused


def to_public_dict(cfg: EngineConfig) -> dict:
    """Credential-redacting dump for logs
    (/root/reference/src/scicat_configuration.py:264-281 redacts sasl
    passwords; same posture for the catalog token)."""
    d = dataclasses.asdict(cfg)
    if d.get("scicat", {}).get("token"):
        d["scicat"]["token"] = "***"
    if d.get("kafka", {}).get("sasl_password"):
        d["kafka"]["sasl_password"] = "***"
    return d
