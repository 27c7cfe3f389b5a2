#!/usr/bin/env python
"""Dump .explain('formatted') receipts for named queries (optimization
rounds). Usage: python dump_plan.py <round_dir_tag> <before|after> name...
Writes plans/<tag>/<query>_<when>.txt at $SPARK_GRAFT_SF_DIR (sf0.1
default) — the judge checks plan claims against these files.
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from hbacker_spark.registry import load_all_queries  # noqa: E402
from hbacker_spark.session import get_spark  # noqa: E402


def main() -> None:
    tag, when, names = sys.argv[1], sys.argv[2], sys.argv[3:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out = Path(__file__).resolve().parent / "plans" / tag
    out.mkdir(parents=True, exist_ok=True)
    spark = get_spark("hbacker_plandump")
    spark.sparkContext.setLogLevel("ERROR")
    specs = load_all_queries()
    for name in names:
        matches = [n for n in specs if name in n]
        for n in matches if name not in specs else [name]:
            df = specs[n].fn(spark, sf_dir)
            txt = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            (out / f"{n}_{when}.txt").write_text(txt)
            print(n, "->", out / f"{n}_{when}.txt")


if __name__ == "__main__":
    main()
