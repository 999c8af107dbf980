"""spark-submit entry-point smoke test (pysearch.cli)."""

import json

from pysearch.cli import main
from pysearch.fixtures import generate_repo_files


def test_cli_build_merge_query(spark, tmp_index, tmp_path, capsys):
    corpus_path = str(tmp_path / "corpus.parquet")
    generate_repo_files(spark, 200, seed=4).write.parquet(corpus_path)

    assert main(["build", "--corpus", corpus_path, "--index", tmp_index,
                 "--segment-rows", "64"]) == 0
    built = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert built["built_docs"] == 200

    assert main(["merge", "--index", tmp_index, "--force", "1"]) == 0
    merged = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert len(merged["merged"]) == 1

    assert main(["query", "--index", tmp_index, "--text", "license merge",
                 "--k", "5"]) == 0
    lines = [json.loads(x) for x in capsys.readouterr().out.strip().splitlines()]
    assert len(lines) == 5 and all("doc_id" in r and "score" in r for r in lines)


def test_cli_delete_verify_gc_stats_minscore(spark, tmp_index, tmp_path, capsys):
    corpus_path = str(tmp_path / "corpus2.parquet")
    generate_repo_files(spark, 150, seed=9).write.parquet(corpus_path)
    assert main(["build", "--corpus", corpus_path, "--index", tmp_index,
                 "--segment-rows", "64"]) == 0
    capsys.readouterr()

    assert main(["delete", "--index", tmp_index, "--key", "d1",
                 "--where", "lang = 'go'"]) == 0
    n = json.loads(capsys.readouterr().out.strip().splitlines()[-1])["tombstoned"]
    assert n > 0

    assert main(["query", "--index", tmp_index, "--text", "license",
                 "--min-score", "0.000001"]) == 0
    lines = [json.loads(x) for x in capsys.readouterr().out.strip().splitlines()]
    assert len(lines) > 5  # radial mode: unbounded by k

    assert main(["merge", "--index", tmp_index, "--force", "1", "--compact"]) == 0
    capsys.readouterr()
    assert main(["verify", "--index", tmp_index, "--corpus", corpus_path]) == 0
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["docs"] == 150 - n and summary["sha_checked"] == 150 - n

    assert main(["gc", "--index", tmp_index]) == 0
    capsys.readouterr()
    assert main(["stats", "--index", tmp_index]) == 0
    rows = [json.loads(x) for x in capsys.readouterr().out.strip().splitlines()]
    assert any(r["stage"] == "merge_total" for r in rows)


def test_cli_multifield_build_query(spark, tmp_index, tmp_path, capsys):
    corpus_path = str(tmp_path / "corpus_mf.parquet")
    df = spark.createDataFrame(
        [("r", f"p{i}", "c", "py", t, s) for i, (t, s) in enumerate(
            [("spark merge", "alpha"), ("table scan", "beta"),
             ("merge row", "alpha"), ("spark spark", "gamma")] * 10
        )],
        "repo string, path string, commit string, lang string, content string, title string",
    )
    df.write.parquet(corpus_path)
    assert main(["build", "--corpus", corpus_path, "--index", tmp_index,
                 "--segment-rows", "16", "--fields", "content,title"]) == 0
    capsys.readouterr()
    assert main(["query", "--index", tmp_index, "--text", "alpha spark",
                 "--fields", "content=1,title=2", "--k", "5"]) == 0
    lines = [json.loads(x) for x in capsys.readouterr().out.strip().splitlines()]
    assert len(lines) == 5
