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
