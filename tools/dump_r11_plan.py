"""Dump `.explain("formatted")` for named queries into plans/r11/.

    python tools/dump_r11_plan.py before flagship llm_dedup_minhash ...
    python tools/dump_r11_plan.py after  flagship ...
    python tools/dump_r11_plan.py before llm_ann_recall_report=tools.experiments_r11:recall_report_serial

A name may be ``outname=module:callable`` to dump a preserved pre-change
variant under the query's name (the experiments module keeps old
formulations verbatim). Plans are captured at sf0.1 — the bench fixture —
so Exchange counts and join strategies match what the bench executed.
"""

from __future__ import annotations

import importlib
import os
import sys

sys.path.insert(0, "/root/repo")

from bridge_analytics_template_spark.queries import QUERIES  # noqa: E402
from bridge_analytics_template_spark.session import get_spark  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r11")


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    os.makedirs(OUT, exist_ok=True)
    spark = get_spark("plan-dump-r11")
    for name in names:
        if "=" in name:
            out_name, spec = name.split("=", 1)
            mod, fn = spec.split(":", 1)
            func = getattr(importlib.import_module(mod), fn)
        else:
            out_name, func = name, QUERIES[name]
        df = func(spark, SF)
        txt = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        )
        path = os.path.join(OUT, f"{out_name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(txt)
        print("wrote", path)
        spark.catalog.clearCache()


if __name__ == "__main__":
    main()
