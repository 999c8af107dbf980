"""Tokenizer + doc-id assignment tests.

Doc-id determinism mirrors GraphNodeIdToDocMapTests: the ordinal<->doc map
must be a pure function of the data, independent of partitioning."""

from pyspark.sql import functions as F

from pysearch.corpus import assign_doc_ids
from pysearch.fixtures import generate_repo_files
from pysearch.analyze import tokenize_code_text, tokenize_text, with_tokens


def test_tokenize_basic():
    assert tokenize_text("Hello, World! foo_bar x1") == ["hello", "world", "foo", "bar", "x1"]
    assert tokenize_text("") == []
    assert tokenize_text(None) == []


def test_tokenize_code_subwords():
    assert tokenize_code_text("getFooBar snake_case HTTPServer") == [
        "get", "foo", "bar", "snake", "case", "http", "server",
    ]


def test_with_tokens_udf(spark):
    df = spark.createDataFrame(
        [("r", "p", "c", "l", "a b a  c")], "repo string, path string, commit string, lang string, content string"
    )
    row = with_tokens(df).collect()[0]
    assert row["tokens"] == ["a", "b", "a", "c"] and row["dl"] == 4


def test_doc_ids_deterministic_across_parallelism(spark):
    corpus = generate_repo_files(spark, 500, seed=42)
    a = assign_doc_ids(corpus, num_partitions=2).select("repo", "path", "doc_id")
    b = assign_doc_ids(corpus.repartition(13), num_partitions=7).select(
        "repo", "path", "doc_id"
    )
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_doc_ids_dense_and_ordered(spark):
    corpus = generate_repo_files(spark, 300, seed=1)
    ids = assign_doc_ids(corpus)
    n = ids.count()
    rows = ids.orderBy("doc_id").select("doc_id", "repo", "path").collect()
    assert [r["doc_id"] for r in rows] == list(range(n))
    keys = [(r["repo"], r["path"]) for r in rows]
    assert keys == sorted(keys)


def test_fixture_corpus_shape(spark):
    corpus = generate_repo_files(spark, 400, seed=42)
    assert corpus.columns == ["repo", "path", "commit", "lang", "content"]
    # deterministic across invocations
    c1 = corpus.agg(F.sum(F.crc32("content"))).collect()[0][0]
    c2 = generate_repo_files(spark, 400, seed=42).agg(F.sum(F.crc32("content"))).collect()[0][0]
    assert c1 == c2
    # Zipf repo skew: org0/repo0 is the hottest repo
    top = corpus.groupBy("repo").count().orderBy(F.desc("count")).first()
    assert top["repo"] == "org0/repo0"


def test_jsonl_corpus_loader(spark, tmp_path):
    import json as _json

    from pysearch.corpus import load_repo_files_jsonl

    p = tmp_path / "corpus.jsonl"
    rows = [
        {"repo": "o/r", "path": "a.py", "content": "import license foo", "lang": "python", "extra": 1},
        {"repo": "o/r", "path": "b.py", "content": "merge query"},  # no commit/lang
    ]
    p.write_text("\n".join(_json.dumps(r) for r in rows))
    df = load_repo_files_jsonl(spark, str(p))
    assert df.columns == ["repo", "path", "commit", "lang", "content"]
    got = {r["path"]: r for r in df.collect()}
    assert got["b.py"]["lang"] == "unknown" and got["b.py"]["commit"] is not None
    assert got["a.py"]["lang"] == "python"
