"""Real ``spark-submit --py-files`` end-to-end (the north rule's ship
shape — test_package.py proves the zip is fresh + zipimportable, this
proves the ACTUAL submit path: spark-submit launches the driver, the
package resolves from the shipped zip alone, the synthetic pipeline
runs, the summary JSON prints).

    python tools/make_package.py
    SPARK_GRAFT_CPUS=4 /opt/spark/bin/spark-submit \
        --py-files dist/deduplication_framework_spark.zip \
        tools/submit_smoke.py --synthetic 300 \
        --output /tmp/submit_out --checkpoint-dir /tmp/submit_ckpt \
        --detectors exact,minhash

The import-origin assert is the point of the exercise: a cluster user
has no repo checkout on the executors or the driver, so the smoke
strips the repo root from sys.path FIRST and then requires the package
to have loaded from the zip — a module silently resolving from the
checkout would mask a stale/incomplete zip (the exact failure
test_package.py exists to prevent, here proven on the real wire).
"""

import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
# the driver runs from the repo checkout in this sandbox; a real cluster
# driver would not have it — simulate that by refusing to import from it
sys.path = [p for p in sys.path if os.path.abspath(p or ".") != _REPO]

import deduplication_framework_spark as pkg  # noqa: E402

assert ".zip" in os.path.abspath(pkg.__file__), (
    f"package resolved from {pkg.__file__}, not the --py-files zip"
)

from deduplication_framework_spark.__main__ import main  # noqa: E402

if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
