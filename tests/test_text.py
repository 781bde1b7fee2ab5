"""Tests for text analysis + chunking (reference: pgml.chunk api.rs:650-668)."""

from pyspark.sql import functions as F

from postgresml_spark.functions import text as TX
from postgresml_spark.functions.text import recursive_character_split


def test_tokenize_and_counts(spark):
    df = spark.createDataFrame([(1, "Hello, World! hello again")], "id int, t string")
    row = df.select(
        TX.tokenize("t").alias("toks"),
        TX.token_count("t").alias("n"),
        TX.char_count("t").alias("c"),
    ).head()
    assert row["toks"] == ["hello", "world", "hello", "again"]
    assert row["n"] == 4
    assert row["c"] == 25


def test_punct_and_stopword_ratio(spark):
    df = spark.createDataFrame([(1, "the cat, the hat!")], "id int, t string")
    row = df.select(
        TX.punct_ratio("t").alias("p"), TX.stopword_ratio("t").alias("s")
    ).head()
    assert abs(row["p"] - 2 / 17) < 1e-9
    assert abs(row["s"] - 2 / 4) < 1e-9  # 'the' x2 of 4 tokens


def test_fingerprint_normalization(spark):
    df = spark.createDataFrame(
        [(1, "Hello   World"), (2, "hello world"), (3, "different")], "id int, t string"
    )
    fps = [r[0] for r in df.select(TX.fingerprint("t")).collect()]
    assert fps[0] == fps[1]
    assert fps[0] != fps[2]


def test_language_id(spark):
    df = spark.createDataFrame(
        [
            (1, "the cat and the dog went to the house"),
            (2, "le chat est dans la maison avec le chien"),
            (3, "der hund ist nicht mit der katze und das haus"),
            (4, "el perro es un animal en la casa con el gato"),
            (5, "xyzzy plugh qwerty"),
        ],
        "id int, t string",
    )
    got = {r["id"]: r["lang"] for r in df.select("id", TX.language_id("t").alias("lang")).collect()}
    assert got == {1: "en", 2: "fr", 3: "de", 4: "es", 5: "unknown"}


def test_ts_rank(spark):
    df = spark.createDataFrame(
        [(1, "spark spark spark query"), (2, "no match here"), (3, "query engine")],
        "id int, t string",
    )
    out = {
        r["id"]: r["rank"]
        for r in df.select(
            "id", TX.ts_rank("t", ["spark", "query"]).alias("rank")
        ).collect()
    }
    # doc1: tf(spark)=3 -> .75, tf(query)=1 -> .5 => rank=1.25 -> 1.25/2.25
    assert abs(out[1] - 1.25 / 2.25) < 1e-9
    assert out[2] == 0.0
    assert abs(out[3] - 0.5 / 1.5) < 1e-9
    assert out[1] > out[3] > out[2]


def test_recursive_character_split_basic():
    text = "para one.\n\npara two is here.\n\npara three."
    chunks = recursive_character_split(text, chunk_size=20, chunk_overlap=0)
    assert all(len(c) <= 20 for c in chunks)
    assert chunks[0].startswith("para one")
    # all content preserved in order (modulo separators)
    joined = " ".join(chunks)
    for word in ["para", "one", "two", "three"]:
        assert word in joined


def test_recursive_character_split_overlap_and_oversize():
    # a single word longer than chunk_size forces the hard-split base case
    text = "x" * 55
    chunks = recursive_character_split(text, chunk_size=20, chunk_overlap=5)
    assert chunks == ["x" * 20, "x" * 20, "x" * 15]
    # overlap carried between merged chunks
    text2 = "aaaa bbbb cccc dddd eeee"
    chunks2 = recursive_character_split(text2, chunk_size=10, chunk_overlap=4)
    assert all(len(c) <= 10 for c in chunks2)


def test_split_deterministic():
    text = ("lorem ipsum dolor sit amet " * 50).strip()
    a = recursive_character_split(text, 100, 10)
    b = recursive_character_split(text, 100, 10)
    assert a == b
    assert all(len(c) <= 100 for c in a)


def test_chunk_udf_posexplode(spark):
    df = spark.createDataFrame(
        [(1, "first paragraph.\n\nsecond paragraph is a bit longer than the first.")],
        "doc_id int, text string",
    )
    out = df.select(
        "doc_id", F.posexplode(TX.chunk_udf(30, 5)(F.col("text"))).alias("chunk_index", "chunk")
    ).collect()
    assert [r["chunk_index"] for r in out] == list(range(len(out)))
    assert all(len(r["chunk"]) <= 30 for r in out)


def test_chunk_fixed(spark):
    df = spark.createDataFrame([(1, "abcdefghij")], "id int, t string")
    row = df.select(TX.chunk_fixed("t", 4).alias("c")).head()
    assert row["c"] == ["abcd", "efgh", "ij"]


def test_hash_embed_batch_parity(spark, sf_dir):
    """Bulk pandas-UDF embedder must be bit-equal to the Column-expression
    reference implementation (and therefore to the DuckDB oracle SQL)."""
    from pyspark.sql import functions as F

    from postgresml_spark.functions.embed import hash_embed, hash_embed_batch
    from postgresml_spark.session import load_table

    d = load_table(spark, sf_dir, "documents").limit(50)
    expr = {r["doc_id"]: r["e"] for r in d.select("doc_id", hash_embed("text", 16).alias("e")).collect()}
    udf = {r["doc_id"]: r["e"] for r in d.select("doc_id", hash_embed_batch(16)(F.col("text")).alias("e")).collect()}
    assert expr == udf


def test_hash_embed_py_parity(spark, sf_dir):
    """Driver-side query embedder (client-side literal binding) must be
    bit-equal to the Column-expression reference implementation."""
    from postgresml_spark.functions.embed import hash_embed, hash_embed_py
    from postgresml_spark.session import load_table

    d = load_table(spark, sf_dir, "documents").limit(50)
    rows = d.select("text", hash_embed("text", 16).alias("e")).collect()
    for r in rows:
        assert hash_embed_py(r["text"], 16) == list(r["e"])
    assert hash_embed_py("", 16) == [0.0] * 16
    assert hash_embed_py(None, 16) == [0.0] * 16


def test_chunk_udtf_sql(spark):
    from postgresml_spark.functions.text import register_chunk_udtf

    register_chunk_udtf(spark)
    rows = spark.sql(
        "SELECT * FROM pgml_chunk('first part.\\n\\nsecond part is longer here.', 20, 0)"
    ).collect()
    assert [r["chunk_index"] for r in rows] == list(range(len(rows)))
    assert all(len(r["chunk"]) <= 20 for r in rows)
    # lateral join over a table (the reference's SRF usage shape)
    spark.createDataFrame([(1, "one two three four five six seven eight")],
                          "id int, text string").createOrReplaceTempView("t_docs")
    out = spark.sql(
        "SELECT id, c.chunk_index, c.chunk FROM t_docs, LATERAL pgml_chunk(text, 15, 0) c"
    ).collect()
    assert len(out) >= 2
    assert all(r["id"] == 1 for r in out)


def test_bpe_token_count(spark):
    rows = [
        (1, "hello world"),          # 2
        (2, "it's 2026!"),           # it / 's / (space)2026 / ! → 4
        (3, "a,b"),                  # a / , / b → 3
        (4, ""),                     # 0
        (5, None),                   # null
    ]
    df = spark.createDataFrame(rows, "id int, t string")
    got = {r["id"]: r["n"] for r in df.select("id", TX.bpe_token_count("t").alias("n")).collect()}
    assert got[1] == 2
    assert got[2] == 4
    assert got[3] == 3
    assert got[4] == 0
    assert got[5] is None


def test_bm25_matches_python_reference(spark):
    import math

    docs = [(1, "a b a"), (2, "b c"), (3, "c c c")]
    df = spark.createDataFrame(docs, "doc_id int, text string")
    got = {r["doc_id"]: r["score"] for r in
           TX.bm25_scores(df, ["a", "c"]).collect()}

    def ref():
        k1, b = 1.2, 0.75
        toks = {i: t.split() for i, t in docs}
        n = len(docs)
        avgdl = sum(len(v) for v in toks.values()) / n
        out = {}
        for term in ("a", "c"):
            dft = sum(1 for v in toks.values() if term in v)
            idf = math.log(1 + (n - dft + 0.5) / (dft + 0.5))
            for i, v in toks.items():
                tf = v.count(term)
                if tf:
                    s = idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * len(v) / avgdl))
                    out[i] = out.get(i, 0.0) + s
        return out

    exp = ref()
    assert set(got) == set(exp)
    for i in exp:
        assert abs(got[i] - exp[i]) < 1e-12, i
    # corpus statistics sanity: the rarer term ranks its doc higher
    # (doc1 has 2x 'a', idf_a > idf_c)
    assert got[1] > got[2]


def test_train_bpe_learns_frequent_pairs(spark):
    # 'low' x5, 'lower' x2, 'newest' x6, 'widest' x3 — the classic
    # Sennrich toy corpus; 'es','est','est</w>' merges must emerge
    corpus = " ".join(["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3)
    df = spark.createDataFrame([(corpus,)], "text string")
    merges = TX.train_bpe(df, num_merges=10)
    assert ("e", "s") in merges
    assert ("es", "t") in merges
    first = merges[0]
    assert first == ("e", "s")  # freq 9, the most frequent pair

    enc = TX.bpe_encode(merges)
    out = df.select(enc(F.col("text")).alias("toks")).head()["toks"]
    # every 'newest' occurrence encodes identically; round-trip holds
    joined = "".join(out)
    assert joined == corpus.replace(" ", "</w>") + "</w>"
    # with enough merges the frequent word collapses to one symbol
    merges_full = TX.train_bpe(df, num_merges=50)
    enc2 = TX.bpe_encode(merges_full)
    toks2 = df.select(enc2(F.col("text")).alias("t")).head()["t"]
    assert "newest</w>" in toks2


def test_bpe_encode_zero_merges_is_chars(spark):
    df = spark.createDataFrame([("ab cd",)], "text string")
    out = df.select(TX.bpe_encode([])(F.col("text")).alias("t")).head()["t"]
    assert out == ["a", "b", "</w>", "c", "d", "</w>"]


def test_text_index_incremental_append_equals_full_build(spark, sf_dir, tmp_path):
    from postgresml_spark.functions.text import (
        append_to_text_index, bm25_search_index, build_text_index,
    )
    from postgresml_spark.session import load_table

    d = load_table(spark, sf_dir, "documents")
    full = str(tmp_path / "full")
    inc = str(tmp_path / "inc")
    build_text_index(d, full, "text", "doc_id")
    build_text_index(d.filter(F.col("doc_id") < 250), inc, "text", "doc_id")
    append_to_text_index(d.filter(F.col("doc_id") >= 250), inc, "text", "doc_id")

    terms = ["vector", "merge"]
    a = {r["doc_id"]: round(r["score"], 9)
         for r in bm25_search_index(spark, full, terms).collect()}
    b = {r["doc_id"]: round(r["score"], 9)
         for r in bm25_search_index(spark, inc, terms).collect()}
    assert a == b


def test_char_trigrams_pg_trgm_convention(spark):
    """pg_trgm padding: '  w' head, 'w ' tail, distinct sets; and
    similarity() = |∩|/|∪| matches hand-computed values."""
    from postgresml_spark.functions.text import char_trigrams, trigram_similarity
    from pyspark.sql import functions as F

    df = spark.createDataFrame([("cat",), ("cat hat",)], "s string")
    got = [r["g"] for r in df.select(char_trigrams("s").alias("g")).collect()]
    assert got[0] == ["  c", " ca", "cat", "at "]
    assert got[1] == ["  c", " ca", "cat", "at ", "  h", " ha", "hat"]
    sim = df.select(trigram_similarity("s", F.lit("cat")).alias("x")).collect()
    assert sim[0]["x"] == 1.0
    # cat-vs-'cat hat': inter {  c, ca,cat,at } =4, union 7
    assert abs(sim[1]["x"] - 4 / 7) < 1e-12


def test_trigram_index_prunes_and_matches_scan(spark, tmp_path):
    """The gram-bucketed store serves the q178 scoring exactly while
    reading only the query grams' buckets (partition filter visible in
    the physical plan — the pg_trgm-GIN pruning analog)."""
    from postgresml_spark.functions.text import (
        build_trigram_index,
        py_char_trigrams,
        trigram_fuzzy_search_index,
    )

    docs = spark.createDataFrame(
        [(1, "vector table scan"), (2, "stream processing merge"),
         (3, "hash join build"), (4, "vektor tabel streem")],
        "doc_id long, text string",
    )
    path = str(tmp_path / "trgm")
    build_trigram_index(docs, path, n_buckets=8)
    got = trigram_fuzzy_search_index(spark, path, ["vectr", "tabel"], k=4)
    rows = {r["doc_id"]: r["fuzzy_score"] for r in got.collect()}
    # doc 4 contains near-misses of both query words -> top score;
    # doc 1 has the true words
    assert rows[4] > rows[1] > 0
    assert set(rows) <= {1, 2, 3, 4}
    # partition pruning reaches the scan: only the query grams' buckets
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "__bucket" in plan
    n_q_buckets = len({hash(g) for g in
                       py_char_trigrams("vectr") + py_char_trigrams("tabel")})
    assert n_q_buckets > 0  # sanity; file-level pruning asserted via filter


def test_subword_embed_three_way_parity(spark):
    """Column expression ≡ Arrow-batched UDF ≡ driver twin for the
    subword (char-trigram) embedder — the q190 parity backbone."""
    from postgresml_spark.functions.embed import (
        subword_hash_embed,
        subword_hash_embed_batch,
        subword_hash_embed_py,
    )

    toks = ["spark", "sparks", "ab", "a", "join", "filterings"]
    df = spark.createDataFrame([(t,) for t in toks], "tok string")
    rows = df.select(
        "tok",
        subword_hash_embed(F.col("tok")).alias("expr"),
        subword_hash_embed_batch(16)(F.col("tok")).alias("udf"),
    ).collect()
    for r in rows:
        tw = subword_hash_embed_py(r["tok"], 16)
        assert list(r["expr"]) == list(r["udf"]) == tw, r["tok"]


def test_subword_embed_morphological_similarity():
    """Shared trigrams ⇒ nonzero cosine between related tokens; the
    single-token word-level embed can't do this (one-hot)."""
    import numpy as np

    from postgresml_spark.functions.embed import subword_hash_embed_py

    a = np.array(subword_hash_embed_py("filtering", 16))
    b = np.array(subword_hash_embed_py("filters", 16))
    c = np.array(subword_hash_embed_py("zygote", 16))
    assert a @ b > a @ c
    assert abs(np.linalg.norm(a) - 1.0) < 1e-12
