#!/usr/bin/env python
"""sf1-equivalent bench point (VERDICT r11 #8): materialize the 10x
key-shifted blowup of sf0.1 (the same generator the scale probe uses —
scripts/scale_probe.py `_blowup`, key-shifted so clusters/blocks grow
in COUNT, not size) under a scratch `sf1` directory, then run the
UNCHANGED bench harness against it and save the artifact as
BENCH_SF1_LOCAL.json.

Why this exists: at sf0.1 ~50 of the 64 headline queries sit at the
~0.15 s/job orchestration floor where 8 cores ≈ 32 cores and further
wins are unmeasurable noise; the 10x point gives optimization claims a
signal that outruns the floor. NOT part of the driver contract — the
driver benches sf0.1; this artifact is the repo's own evidence.

    python scripts/bench_sf1.py [scratch_root]

bench.py writes BENCH_LOCAL.json unconditionally, so this wrapper
snapshots it first and restores it after moving the sf1 record to
BENCH_SF1_LOCAL.json.
"""

from __future__ import annotations

import os
import shutil
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    scratch = sys.argv[1] if len(sys.argv) > 1 else "/tmp/graft_sf1"
    sf1_dir = os.path.join(scratch, "sf1")
    os.makedirs(sf1_dir, exist_ok=True)

    from covid_engineering_spark.session import get_spark
    import scripts.scale_probe as sp

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(app_name="blowup-sf1", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")
    sp._blowup(spark, sf1_dir, 10)
    spark.stop()

    local = os.path.join(REPO, "BENCH_LOCAL.json")
    backup = local + ".pre_sf1"
    if os.path.exists(local):
        shutil.copy(local, backup)
    env = dict(os.environ, SPARK_GRAFT_SF_DIR=sf1_dir)
    rc = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")], env=env
    ).returncode
    if rc == 0 and os.path.exists(local):
        shutil.move(local, os.path.join(REPO, "BENCH_SF1_LOCAL.json"))
    if os.path.exists(backup):
        shutil.move(backup, local)
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
