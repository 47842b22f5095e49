#!/usr/bin/env python3
"""Video/image corpus preprocessing example: MP4 container demux ->
frame-range sampling -> per-track statistics, plus JPEG entropy
decode (baseline here; the engine also decodes progressive SOF2) —
the container/entropy halves of the codec boundary that are REAL in
this engine (only H.264/AAC payload decode and arithmetic-coded
JPEG modes stay gated).

A training-data pipeline uses exactly this shape at 100 TB: demux is
scan-local metadata extraction (no shuffle, binary column never
moves), frame sampling selects byte ranges BEFORE any GPU decode, and
the relational layer (groupBy/joins over small typed rows) runs on
the extracted metadata, not the payloads.

Usage:
    python examples/video_corpus_demux.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from scicat_ingestor_spark.operators import jpegc, mp4  # noqa: E402
from scicat_ingestor_spark.session import get_session  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_session("video_corpus_demux")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    # ---- "videos": one two-track MP4 per document (stands in for a
    # payload column read from blob storage)
    def synth_mp4(batches):
        import pandas as pd

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["doc_id"],
                    "payload": [mp4.make_mp4(int(i)) for i in pdf["doc_id"]],
                }
            )

    videos = docs.select("doc_id").mapInPandas(
        synth_mp4, schema="media_id long, payload binary"
    )

    tracks = mp4.demux_tracks(videos)
    print("== per-handler corpus stats (relational layer on demuxed metadata)")
    tracks.groupBy("handler", "codec").agg(
        F.count("*").alias("n_tracks"),
        F.sum("sample_bytes").alias("total_bytes"),
        F.round(F.avg("n_samples"), 2).alias("avg_samples"),
        F.round(
            F.avg(F.col("duration") / F.col("timescale")), 3
        ).alias("avg_seconds"),
    ).orderBy("handler").show()

    print("== frame sampling: every 2nd video sample's byte range + checksum")
    frames = mp4.sample_frames(videos, every_n=2)
    frames.agg(
        F.count("*").alias("n_frames"),
        F.sum("frame_bytes").alias("sampled_bytes"),
    ).show()

    # ---- "images": baseline JPEGs through the real entropy decoder
    def synth_jpeg(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for i in pdf["doc_id"]:
                i = int(i)

                def bv(ci, bx, by, _id=i):
                    return (bx * 29 + by * 31 + _id * 7) % 256

                rows.append(
                    jpegc.make_jpeg_baseline(
                        8 * ((i % 4) + 1), 8 * ((i % 3) + 1), bv,
                        restart_interval=2 if i % 2 else 0,
                    )
                )
            yield pd.DataFrame({"media_id": pdf["doc_id"], "payload": rows})

    images = docs.select("doc_id").limit(2000).mapInPandas(
        synth_jpeg, schema="media_id long, payload binary"
    )
    print("== baseline JPEG entropy decode: per-size mean luma")
    jpeg = jpegc.decode_jpeg_pixels(images)
    jpeg.groupBy("width", "height").agg(
        F.count("*").alias("n"),
        F.round(F.avg("mean_c0"), 3).alias("avg_luma"),
    ).orderBy("width", "height").show()


if __name__ == "__main__":
    main()
