"""End-to-end smoke of the curation job entrypoint
(jobs/run_curate.py): runs main() in-process over the sf0.001
documents table and checks the stage funnel + output layout."""

from __future__ import annotations

import json
import sys


def test_run_curate_end_to_end(spark, tmp_path, capsys, monkeypatch):
    # eval set = docs 0-9: those ids (when they survive dedup) are
    # decontaminated away; the rest of the corpus flows through
    eval_path = str(tmp_path / "eval")
    (spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
     .filter("doc_id < 10").write.parquet(eval_path))
    monkeypatch.setattr(sys, "argv", [
        "run_curate.py",
        "--input", "/root/testdata/sf0.001/documents.parquet",
        "--out", str(tmp_path / "curated"),
        "--eval-input", eval_path,
        "--pack-budget", "256", "--pack-shards", "4",
    ])
    import importlib
    import jobs.run_curate as rc
    importlib.reload(rc)
    rc.main()
    line = capsys.readouterr().out.strip().splitlines()[-1]
    st = json.loads(line)["stats"]
    # monotone funnel: every stage can only drop rows
    assert (st["input"] >= st["after_exact_dedup"]
            >= st["after_neardup_dedup"] >= st["curated"])
    assert st["input"] == 500
    assert st["written"] == st["curated"]
    out = spark.read.parquet(str(tmp_path / "curated" / "data"))
    # the eval docs themselves are fully self-overlapping => gone
    assert out.filter("doc_id < 10").count() == 0
    assert out.count() > 100  # the bulk of the corpus flows through
    assert set(out.select("split").distinct().toPandas()["split"]) \
        <= {"train", "val", "test"}
    # train rows carry pack assignments
    tr = out.filter("split = 'train'")
    if tr.count():
        assert tr.filter("pack_idx IS NULL").count() == 0
