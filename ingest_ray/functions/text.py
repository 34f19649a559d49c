"""Text analysis stages over a documents table (doc_id, text, ...).

All bodies are vectorized pandas/numpy per batch; regexes are
compiled at module load (stateless map_batches tasks — nothing here
needs an actor). Token semantics are defined to match the DuckDB
oracle exactly (whitespace split on trimmed text).
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa

from ..util import hash64_str

_WS = re.compile(r"\s+")
_PUNCT = re.compile(r"[.,!?;:]")
_UPPER = re.compile(r"[A-Z]")
_WORD = re.compile(r"[A-Za-z]+|[0-9]+|\S", re.U)  # BPE-ish greedy pieces

# tiny public stopword lists for the language-ID heuristic
_LANG_STOPWORDS = {
    "en": {"the", "and", "of", "a", "to", "in", "is", "it", "that", "for"},
    "de": {"der", "die", "das", "und", "ist", "nicht", "ein", "mit", "von", "zu"},
    "fr": {"le", "la", "les", "et", "est", "un", "une", "des", "que", "pour"},
    "es": {"el", "la", "los", "y", "es", "un", "una", "de", "que", "por"},
}


def token_count_batch(df: pd.DataFrame) -> pd.DataFrame:
    """doc_id, n_tokens — whitespace tokens of trimmed text (0 for
    blank). Oracle-matched: len(string_split_regex(trim(text),'\\s+')).

    Vectorized: tokens of a trimmed non-blank string = runs of
    whitespace + 1, so one ``str.count`` replaces the per-row split."""
    t = df["text"].fillna("").str.strip()
    n = (t.str.count(_WS) + 1).where(t != "", 0)
    return pd.DataFrame({"doc_id": df["doc_id"], "n_tokens": n.astype("int64")})


def quality_score_batch(df: pd.DataFrame) -> pd.DataFrame:
    """doc_id, n_chars_calc, n_punct, n_upper, blank — cheap quality
    signals, all SQL-expressible for the oracle."""
    t = df["text"].fillna("")
    n_chars = t.str.len().astype("int64")
    # vectorized counts (C regex engine, no per-row Python); [A-Z]
    # matches the oracle's regexp_replace('[^A-Z]') semantics exactly
    n_punct = t.str.count(_PUNCT).astype("int64")
    n_upper = t.str.count(_UPPER).astype("int64")
    blank = (t.str.strip() == "").astype("int64")
    return pd.DataFrame(
        {
            "doc_id": df["doc_id"],
            "n_chars_calc": n_chars,
            "n_punct": n_punct,
            "n_upper": n_upper,
            "blank": blank,
        }
    )


def lang_id_batch(df: pd.DataFrame) -> pd.DataFrame:
    """doc_id, lang_pred, lang_conf — stopword-vote heuristic.

    DuckDB-oracled (the stopword votes and the tie-break are
    reproduced in SQL — see ``oracle_sql()['lang_id_docs']``).

    Deliberately a per-row loop: Python set intersection against the
    tiny stopword sets is C-speed, and the measured "vectorized"
    rewrite (explode → drop_duplicates → per-language isin) was 2.5×
    SLOWER on the real corpus — the flatten dominates."""
    preds, confs = [], []
    for s in df["text"].fillna(""):
        words = set(w.lower() for w in _WS.split(s.strip())) if s.strip() else set()
        scores = {
            lang: len(words & sw) / max(1, len(sw)) for lang, sw in _LANG_STOPWORDS.items()
        }
        best = max(scores, key=lambda k: (scores[k], k))
        preds.append(best if scores[best] > 0 else "und")
        confs.append(float(scores[best]))
    return pd.DataFrame({"doc_id": df["doc_id"], "lang_pred": preds, "lang_conf": confs})


def token_pieces_batch(df: pd.DataFrame) -> pd.DataFrame:
    """doc_id, n_pieces — BPE-ish regex token pieces (letters / digits /
    single symbols). DuckDB-oracled via ``regexp_extract_all`` (see
    ``oracle_sql()['token_pieces_docs']``)."""
    t = df["text"].fillna("")
    n = t.map(lambda s: len(_WORD.findall(s)))
    return pd.DataFrame({"doc_id": df["doc_id"], "n_pieces": n.astype("int64")})


def fingerprint_batch(df: pd.DataFrame) -> pd.DataFrame:
    """doc_id, fp — 64-bit FNV-1a document fingerprint (stable across
    processes; DuckDB-oracled via a recursive-CTE FNV fold — see
    ``oracle_sql()['fingerprint_docs']``)."""
    fp = hash64_str(df["text"].fillna("").tolist())
    return pd.DataFrame({"doc_id": df["doc_id"], "fp": fp.astype("uint64")})


def normalize_text_batch(df: pd.DataFrame) -> pd.DataFrame:
    """doc_id, norm_text — canonical text: whitespace runs collapsed
    to one space, trimmed, lowercased. The normalization every
    dedup/fingerprint stage upstream of training wants first; exactly
    ``lower(trim(regexp_replace(text, '[ \\t\\n\\r]+', ' ', 'g')))``
    in the DuckDB oracle (explicit ASCII class so Python and RE2
    agree)."""
    t = df["text"].fillna("")
    norm = t.str.replace(_WS_ASCII, " ", regex=True).str.strip().str.lower()
    return pd.DataFrame({"doc_id": df["doc_id"], "norm_text": norm})


_WS_ASCII = re.compile(r"[ \t\n\r]+")


def shingles(text: str, n: int = 3) -> set[int]:
    """Word n-gram shingle hashes (for MinHash / Jaccard)."""
    words = _WS.split(text.strip()) if text.strip() else []
    if len(words) < n:
        return set(hash64_str([" ".join(words)])) if words else set()
    grams = [" ".join(words[i : i + n]) for i in range(len(words) - n + 1)]
    return set(int(h) for h in hash64_str(grams))
