"""Build the ``--py-files`` archive for cluster submission.

Packs the ``ffcl_spark`` package (sources only — no tests, no caches)
into ``dist/ffcl_spark.zip`` with deterministic member order and
timestamps, so repeated builds are byte-identical (reproducible
artifact → content-addressable cache keys on the submit host).

    python scripts/make_pyfiles_zip.py [--out dist/ffcl_spark.zip]
    spark-submit --master ... --py-files dist/ffcl_spark.zip \
        scripts/run_corpus_pipeline.py ...

Executors and the driver unpack the zip onto ``sys.path``; every
``import ffcl_spark.*`` inside the job resolves from it, which is the
whole deployment story — the engine is pure Python over Spark, there
is nothing to compile or install on the cluster.
"""

from __future__ import annotations

import argparse
import os
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
EPOCH = (1980, 1, 1, 0, 0, 0)  # fixed zip timestamp → reproducible bytes


def build(out_path: str) -> list[str]:
    pkg = os.path.join(REPO, "ffcl_spark")
    members: list[str] = []
    for root, dirs, files in os.walk(pkg):
        dirs[:] = sorted(d for d in dirs if d != "__pycache__")
        for f in sorted(files):
            if f.endswith(".py"):
                full = os.path.join(root, f)
                members.append(os.path.relpath(full, REPO))
    os.makedirs(os.path.dirname(os.path.abspath(out_path)), exist_ok=True)
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as z:
        for rel in members:
            info = zipfile.ZipInfo(rel.replace(os.sep, "/"), date_time=EPOCH)
            info.external_attr = 0o644 << 16
            with open(os.path.join(REPO, rel), "rb") as fh:
                z.writestr(info, fh.read(), compresslevel=9)
    return members


if __name__ == "__main__":
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out", default=os.path.join(REPO, "dist", "ffcl_spark.zip"))
    args = ap.parse_args()
    members = build(args.out)
    size = os.path.getsize(args.out)
    print(f"{args.out}: {len(members)} modules, {size} bytes")
