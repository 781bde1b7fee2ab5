"""Embedding operators: pgml.embed equivalent.

Reference (api.rs:589-610; transformers.py:530-573): text → dense
vector via a HF sentence-transformer, batched, executor-cached. In this
container there is no torch/transformers, so two paths:

- `embed_udf(model)` — the REAL plumbing (Arrow-batched pandas UDF,
  per-executor lazy model cache) gated behind an import-try; without
  the library it raises NotImplementedError at call time with a clear
  message. The Spark-side shape (batching, schema, caching) is the
  part that matters at 100 TB and is fully implemented.
- `hash_embed(text, dim)` — a deterministic feature-hashing embedder
  (signed token buckets, L2-normalized), pure Column expressions.
  This is the FIXTURES.md F6 "seeded pseudo-embedder": cheap, scale-
  independent, and reproducible in ANSI SQL (`hash_embed_sql`) so
  search semantics get a DuckDB oracle. It is also a legitimate
  baseline featurizer (hashing trick).

Both produce array<double>; downstream search code is agnostic.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F

from postgresml_spark.functions.text import tokenize

__all__ = [
    "polyhash",
    "hash_embed",
    "hash_embed_batch",
    "hash_embed_py",
    "subword_hash_embed",
    "subword_hash_embed_sql",
    "subword_hash_embed_py",
    "subword_hash_embed_batch",
    "hash_embed_sql",
    "embed_udf",
]

_MOD = 2147483647  # 2^31 - 1


def polyhash(s: Column) -> Column:
    """Deterministic polynomial string hash: fold (acc*31 + ascii(c)) % (2^31-1).

    Engine-portable (same value in DuckDB — see hash_embed_sql), unlike
    xxhash64/murmur which differ across engines.
    """
    return F.aggregate(
        F.split(s, ""),
        F.lit(0).cast("bigint"),
        lambda acc, c: (acc * 31 + F.ascii(c)) % _MOD,
    )


def hash_embed(text: Column | str, dim: int = 16) -> Column:
    """Signed feature-hashing embedding, L2-normalized (array<double>).

    token → h = polyhash(token); bucket = h % dim; sign = ±1 by parity
    of h/dim; accumulate with multiplicity; L2 normalize (zero vector
    for empty text stays all-zero).
    """
    t = F.col(text) if isinstance(text, str) else text
    toks = tokenize(t)
    hashes = F.transform(toks, polyhash)
    counts = F.aggregate(
        hashes,
        F.array_repeat(F.lit(0.0), dim),
        lambda acc, h: F.zip_with(
            acc,
            F.sequence(F.lit(0), F.lit(dim - 1)),
            lambda a, i: a
            + F.when(
                h % dim == i.cast("bigint"),
                F.when((F.floor(h / dim) % 2) == 0, 1.0).otherwise(-1.0),
            ).otherwise(0.0),
        ),
    )
    norm = F.sqrt(F.aggregate(counts, F.lit(0.0), lambda a, x: a + x * x))
    return F.transform(
        counts, lambda x: F.when(norm > 0, x / norm).otherwise(F.lit(0.0))
    )


def hash_embed_sql(expr: str, dim: int = 16) -> str:
    """DuckDB SQL computing the same embedding as hash_embed(expr, dim).

    Used to build oracle queries; `expr` is a SQL string expression
    (e.g. 'text' or a quoted literal).
    """
    toks = (
        f"list_filter(string_split_regex(lower({expr}), '[^a-z0-9]+'), x -> x != '')"
    )
    ph = (
        "list_reduce(list_prepend(CAST(0 AS BIGINT), "
        "list_transform(string_split(tok, ''), c -> CAST(ascii(c) AS BIGINT))), "
        f"(acc, c) -> (acc * 31 + c) % {_MOD})"
    )
    hashes = f"list_transform({toks}, tok -> {ph})"
    counts = (
        f"list_transform(generate_series(0, {dim - 1}), i -> "
        f"list_sum(list_transform({hashes}, h -> "
        f"CASE WHEN h % {dim} = i THEN CASE WHEN (h // {dim}) % 2 = 0 THEN 1.0 ELSE -1.0 END "
        f"ELSE 0.0 END)))"
    )
    # COALESCE: list_sum of empty list is NULL in DuckDB
    counts = f"list_transform({counts}, x -> COALESCE(CAST(x AS DOUBLE), 0.0))"
    # bind `counts` once via a single-element list_transform lambda
    # (correlated scalar subqueries don't bind inside DuckDB lambdas)
    return (
        f"list_transform([{counts}], __cnt -> "
        f"list_transform([sqrt(list_sum(list_transform(__cnt, x -> x * x)))], __n -> "
        f"CASE WHEN __n > 0 THEN list_transform(__cnt, x -> x / __n) ELSE __cnt END"
        f")[1])[1]"
    )


def _polyhash_py(s: str) -> int:
    h = 0
    for ch in s:
        h = (h * 31 + ord(ch)) % _MOD
    return h


def hash_embed_py(text: str, dim: int = 16) -> list[float]:
    """Driver-side twin of hash_embed: same tokenizer regex, same
    integer arithmetic, bit-equal output (tests/test_embed_parity).

    This is the client-side query-embedding path: the reference embeds
    the query string in the client and binds the vector as a literal
    into the search SQL (vector_search_query_builder.rs:189-284) rather
    than paying a round trip per query. One string never needs a Spark
    job — at 1000 executors a per-query embed job is pure scheduler
    overhead.
    """
    import math
    import re

    v = [0.0] * dim
    for tok in re.split(r"[^a-z0-9]+", (text or "").lower()):
        if not tok:
            continue
        h = _polyhash_py(tok)
        v[h % dim] += 1.0 if (h // dim) % 2 == 0 else -1.0
    n = math.sqrt(sum(x * x for x in v))
    return [x / n for x in v] if n > 0 else v


def subword_hash_embed(tok: Column, dim: int = 16, n: int = 3) -> Column:
    """Per-TOKEN embedding from character n-grams (fastText-style
    subword hashing): tokens shorter than ``n`` contribute themselves
    as one gram, so no token maps to the zero vector. Unlike a
    single-token `hash_embed` (which is a signed one-hot — degenerate
    for similarity), subword vectors give morphologically close tokens
    nonzero cosine, which is what late-interaction retrieval (q190)
    scores. Same polyhash/bucket/sign/L2 arithmetic as hash_embed, so
    `subword_hash_embed_sql` reproduces it in DuckDB."""
    grams = F.when(F.length(tok) < n, F.array(tok)).otherwise(
        F.transform(
            F.sequence(F.lit(1), F.length(tok) - (n - 1)),
            lambda i: tok.substr(i, F.lit(n)),
        )
    )
    hashes = F.transform(grams, polyhash)
    counts = F.aggregate(
        hashes,
        F.array_repeat(F.lit(0.0), dim),
        lambda acc, h: F.zip_with(
            acc,
            F.sequence(F.lit(0), F.lit(dim - 1)),
            lambda a, i: a
            + F.when(
                h % dim == i.cast("bigint"),
                F.when((F.floor(h / dim) % 2) == 0, 1.0).otherwise(-1.0),
            ).otherwise(0.0),
        ),
    )
    norm = F.sqrt(F.aggregate(counts, F.lit(0.0), lambda a, x: a + x * x))
    return F.transform(
        counts, lambda x: F.when(norm > 0, x / norm).otherwise(F.lit(0.0))
    )


def subword_hash_embed_sql(expr: str, dim: int = 16, n: int = 3) -> str:
    """DuckDB SQL computing the same vector as subword_hash_embed;
    ``expr`` is a SQL string expression (a token column or a quoted
    literal token)."""
    grams = (
        f"CASE WHEN length({expr}) < {n} THEN [{expr}] "
        f"ELSE list_transform(generate_series(1, length({expr}) - {n - 1}), "
        f"i -> substring({expr}, i, {n})) END"
    )
    ph = (
        "list_reduce(list_prepend(CAST(0 AS BIGINT), "
        "list_transform(string_split(g, ''), c -> CAST(ascii(c) AS BIGINT))), "
        f"(acc, c) -> (acc * 31 + c) % {_MOD})"
    )
    hashes = f"list_transform({grams}, g -> {ph})"
    counts = (
        f"list_transform(generate_series(0, {dim - 1}), i -> "
        f"list_sum(list_transform({hashes}, h -> "
        f"CASE WHEN h % {dim} = i THEN CASE WHEN (h // {dim}) % 2 = 0 THEN 1.0 ELSE -1.0 END "
        f"ELSE 0.0 END)))"
    )
    counts = f"list_transform({counts}, x -> COALESCE(CAST(x AS DOUBLE), 0.0))"
    return (
        f"list_transform([{counts}], __cnt -> "
        f"list_transform([sqrt(list_sum(list_transform(__cnt, x -> x * x)))], __n -> "
        f"CASE WHEN __n > 0 THEN list_transform(__cnt, x -> x / __n) ELSE __cnt END"
        f")[1])[1]"
    )


def subword_hash_embed_py(tok: str, dim: int = 16, n: int = 3) -> list[float]:
    """Driver-side twin (query-token path): same grams, same integer
    arithmetic, bit-equal output."""
    import math

    grams = (
        [tok] if len(tok) < n else [tok[i : i + n] for i in range(len(tok) - n + 1)]
    )
    v = [0.0] * dim
    for g in grams:
        h = _polyhash_py(g)
        v[h % dim] += 1.0 if (h // dim) % 2 == 0 else -1.0
    nm = math.sqrt(sum(x * x for x in v))
    return [x / nm for x in v] if nm > 0 else v


def subword_hash_embed_batch(dim: int = 16, n: int = 3):
    """Arrow-batched bulk path for subword_hash_embed (the Column form
    evaluates interpreted at O(grams × dim)/row — fine for a query's
    handful of tokens, wrong for a corpus vocabulary). Bit-equal
    integer arithmetic; q190 runs it over DISTINCT corpus tokens only,
    so the per-batch memo and the row count are both vocabulary-sized."""
    from pyspark.sql import types as T

    @F.pandas_udf(T.ArrayType(T.DoubleType()))
    def _embed(toks: pd.Series) -> pd.Series:
        out = []
        for tok in toks:
            tok = tok or ""
            grams = (
                [tok]
                if len(tok) < n
                else [tok[i : i + n] for i in range(len(tok) - n + 1)]
            )
            v = np.zeros(dim)
            for g in grams:
                h = _polyhash_py(g)
                v[h % dim] += 1.0 if (h // dim) % 2 == 0 else -1.0
            nrm = np.sqrt((v * v).sum())
            out.append((v / nrm if nrm > 0 else v).tolist())
        return pd.Series(out)

    return _embed


def hash_embed_batch(dim: int = 16):
    """Arrow-batched pandas UDF computing EXACTLY hash_embed's values.

    The Column-expression form is the parity/reference implementation,
    but Catalyst evaluates nested higher-order lambdas interpreted
    (outside whole-stage codegen) at O(tokens × dim) per row — measured
    ~6 ms/doc. This UDF is the bulk path (~50 µs/doc): one Python pass
    per token with a per-batch token→hash memo (corpus token frequency
    follows Zipf, so the memo hit rate is high). Integer arithmetic is
    identical, so outputs are bit-equal — enforced by
    tests/test_embed_parity.
    """
    import re

    from pyspark.sql import types as T

    tok_re = re.compile(r"[^a-z0-9]+")

    @F.pandas_udf(T.ArrayType(T.DoubleType()))
    def _embed(texts: pd.Series) -> pd.Series:
        memo: dict[str, int] = {}
        out = []
        for t in texts:
            v = np.zeros(dim)
            for tok in tok_re.split((t or "").lower()):
                if not tok:
                    continue
                h = memo.get(tok)
                if h is None:
                    h = memo[tok] = _polyhash_py(tok)
                v[h % dim] += 1.0 if (h // dim) % 2 == 0 else -1.0
            n = np.sqrt((v * v).sum())
            out.append((v / n if n > 0 else v).tolist())
        return pd.Series(out)

    return _embed


def embed_udf(model_name: str = "intfloat/e5-small-v2", dim: int = 384):
    """Real-model embedding UDF (pgml.embed): Arrow-batched pandas UDF
    with a per-executor lazy model singleton (the reference caches the
    model per backend process, transformers.py:530-573).

    Raises NotImplementedError per batch when sentence-transformers is
    absent (this container) — the Spark plumbing (batch shape, schema,
    caching pattern) is real and tested via hash_embed.
    """
    import pandas as pd
    from pyspark.sql import types as T

    @F.pandas_udf(T.ArrayType(T.DoubleType()))
    def _embed(texts: pd.Series) -> pd.Series:
        global _EMBED_MODEL  # executor-process cache
        try:
            model = globals().get("_EMBED_MODEL")
            if model is None:
                from sentence_transformers import SentenceTransformer  # type: ignore

                model = SentenceTransformer(model_name)
                globals()["_EMBED_MODEL"] = model
        except ImportError as e:
            raise NotImplementedError(
                f"pgml.embed({model_name!r}) requires sentence-transformers, "
                "not available in this environment; use hash_embed for "
                "deterministic pipelines"
            ) from e
        vecs = model.encode(texts.tolist(), batch_size=256)
        return pd.Series([list(map(float, v)) for v in vecs])

    return _embed


def remote_embed_py(model: str, text: str) -> list[float]:
    """Client-side remote embedding of ONE query string — the
    reference's remote-model path: for OpenAI-backed pipelines the
    query vector is fetched by the CLIENT and inlined into the search
    SQL as a literal (vector_search_query_builder.rs:189-284), so no
    cluster job and no credentials on executors.

    `model` is an 'openai:<name>' id. Import-gated: raises
    NotImplementedError when the openai client is absent (this
    container has no network/credentials either)."""
    name = model.split(":", 1)[1]
    try:
        from openai import OpenAI  # type: ignore
    except ImportError as e:
        raise NotImplementedError(
            f"remote embedding model {model!r} requires the openai "
            "client, not available in this environment; use a "
            "'hash:<dim>' model for deterministic pipelines"
        ) from e
    client = OpenAI()
    resp = client.embeddings.create(model=name, input=[text])
    return [float(x) for x in resp.data[0].embedding]


def remote_embed_udf(model: str):
    """Bulk remote embedding (corpus sync with an OpenAI-backed model):
    Arrow-batched pandas UDF, one API call per Arrow batch with a
    per-executor client singleton. Import-gated like embed_udf; the
    batch shape and schema are the real contract."""
    import pandas as pd
    from pyspark.sql import types as T

    name = model.split(":", 1)[1]

    @F.pandas_udf(T.ArrayType(T.DoubleType()))
    def _embed(texts: pd.Series) -> pd.Series:
        try:
            from openai import OpenAI  # type: ignore
        except ImportError as e:
            raise NotImplementedError(
                f"remote embedding model {model!r} requires the openai "
                "client, not available in this environment"
            ) from e
        client = globals().get("_REMOTE_CLIENT")
        if client is None:
            client = globals()["_REMOTE_CLIENT"] = OpenAI()
        resp = client.embeddings.create(model=name, input=texts.tolist())
        return pd.Series([[float(x) for x in d.embedding] for d in resp.data])

    return _embed
