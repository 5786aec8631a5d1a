"""Round-10 diagnosis harness for m04's recurring bench spread
(VERDICT r9 "Next round" #2: committed 17.8s vs 2.61s min, spread
[2.61, 14.62] across finals since r5, never root-caused).

m04's input is CONSTANT (16 synthesized clips x 8192 samples,
sf-independent), so the spread cannot be data — it must be an
environment term. This script measures the three candidate terms the
verdict names, each in a fresh JVM (fresh `python tools/profile_m04.py
<mode>` invocation per measurement so JVM/codegen/Python-worker state
can't leak between modes):

  cold        — q01 warmup only, then m04 (bench's position-independent
                floor: first mapInPandas the session ever runs).
  after_mm    — q01 warmup, then m01+m02+m03 (the image/video heavies
                that precede m04 alphabetically in bench order), then
                m04 — reproduces m04's actual bench window.
  warm        — q01 warmup, m04 twice; report the second (steady-state
                floor: everything JIT'd, workers up).
  stages      — cold session, m04 split into its pipeline terms:
                synthesis-only (audios_df collect), features
                (audio_features collect), full m04 (adds the groupBy).

Usage: python tools/profile_m04.py {cold|after_mm|warm|stages} [sf_dir]
Prints one JSON line per measurement.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    mode = sys.argv[1] if len(sys.argv) > 1 else "cold"
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"

    import __spark_entry__ as entrymod
    from big_data_analytics_cse545_spark.session import get_spark

    spark = get_spark(
        app_name=f"profile_m04_{mode}",
        master="local[32]",
        shuffle_partitions=32,
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.all_queries()

    def t(fn) -> float:
        t0 = time.perf_counter()
        fn()
        return round(time.perf_counter() - t0, 3)

    out: dict[str, float] = {}
    out["warmup_q01"] = t(lambda: qs["q01_pricing_summary"](spark, sf_dir).collect())

    if mode == "cold":
        out["m04"] = t(
            lambda: qs["m04_audio_feature_profile"](spark, sf_dir).collect()
        )
    elif mode == "after_mm":
        for name in (
            "m01_image_similarity_funnel",
            "m02_video_frame_sample",
            "m03_binaryfile_ref_funnel",
        ):
            out[name.split("_", 1)[0]] = t(lambda n=name: qs[n](spark, sf_dir).collect())
        out["m04"] = t(
            lambda: qs["m04_audio_feature_profile"](spark, sf_dir).collect()
        )
    elif mode == "warm":
        out["m04_first"] = t(
            lambda: qs["m04_audio_feature_profile"](spark, sf_dir).collect()
        )
        out["m04_second"] = t(
            lambda: qs["m04_audio_feature_profile"](spark, sf_dir).collect()
        )
    elif mode == "stages":
        from big_data_analytics_cse545_spark.operators.multimodal import (
            audio_features,
            audios_df,
        )

        out["synthesis_only"] = t(lambda: audios_df(spark, sf_dir).collect())
        out["features"] = t(lambda: audio_features(audios_df(spark, sf_dir)).collect())
        out["full_m04"] = t(
            lambda: qs["m04_audio_feature_profile"](spark, sf_dir).collect()
        )
    else:
        raise SystemExit(f"unknown mode {mode!r}")

    print(json.dumps({"mode": mode, **out}))


if __name__ == "__main__":
    main()
