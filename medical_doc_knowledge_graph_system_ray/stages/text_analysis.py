"""Text-analysis operators over a generic documents table
(doc_id, text, ...): language id, quality scoring, token counting,
fingerprinting. First-class training-data-pipeline stages (brief §extra);
each has a queries() entry with a DuckDB oracle where SQL can express it.

All vectorized per batch (pandas string kernels / numpy); the stateful
variants (compiled regexes, stopword tables) are callable classes for
actor pools.
"""

from __future__ import annotations

import math
import re

import numpy as np
import pandas as pd
import pyarrow as pa

from ..functions.hashing import rolling_fingerprint, simhash64

# tiny per-language stopword profiles for the n-gram/stopword heuristic
_LANG_PROFILES = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "for", "on", "with"},
    "es": {"el", "la", "de", "que", "y", "en", "un", "por", "con", "los"},
    "fr": {"le", "la", "de", "et", "les", "des", "un", "une", "du", "en"},
    "de": {"der", "die", "und", "das", "von", "zu", "mit", "den", "ist", "im"},
}

_WORD_RE = re.compile(r"[A-Za-z]+")


def round_half_away(x, decimals: int = 6):
    """Round-half-AWAY-from-zero (DuckDB / std::round semantics).

    numpy's np.round is round-half-to-EVEN, which diverges from DuckDB's
    round() whenever a value lands on an exact 5e-(d+1) tie — the
    CORRECTNESS r2 quality_scores hash failure (4/500 docs off on the
    6th decimal). The fractional part of |x|*10^d is exact in IEEE for
    |x|*10^d < 2^52, so the half test below is bit-faithful."""
    x = np.asarray(x, dtype=np.float64)
    p = 10.0 ** decimals
    y = np.abs(x) * p
    f = y - np.floor(y)
    r = np.where(f >= 0.5, np.floor(y) + 1.0, np.floor(y)) / p
    return np.where(x < 0, -r, r)


def round_half_away_scalar(v: float, decimals: int = 6) -> float:
    """Scalar fast path of round_half_away for NON-NEGATIVE v.

    ~100x cheaper than the numpy path (no array construction) and
    bit-identical for 0 <= v*10^d < 2^52: v*p + 0.5 is exact there, and
    floor(y + 0.5) == floor(y) + 1 exactly when frac(y) >= 0.5. Use in
    per-pair Python loops (quadratic dedup kernels); keep the array form
    for vectorized columns."""
    p = 10.0 ** decimals
    return math.floor(v * p + 0.5) / p


class LangId:
    """Stopword-profile language guesser (n-gram heuristic stand-in)."""

    def __init__(self):
        self.profiles = _LANG_PROFILES

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        langs = []
        for text in batch["text"]:
            words = set(_WORD_RE.findall(text.lower())[:200])
            best, best_hits = "unknown", 0
            for lang, stops in self.profiles.items():
                hits = len(words & stops)
                if hits > best_hits:
                    best, best_hits = lang, hits
            langs.append(best)
        batch["lang_pred"] = langs
        return batch


def token_count_batch(batch: pa.Table) -> pa.Table:
    """Whitespace token count + a BPE-ish subword estimate (regex pieces).

    Text is trimmed before splitting so the count matches the DuckDB
    oracle (`string_split_regex(trim(text), '\\s+')`) on inputs with
    leading/trailing whitespace (ADVICE r1)."""
    import pyarrow.compute as pc

    texts = batch.column("text")
    ws = pc.list_value_length(
        pc.split_pattern_regex(pc.utf8_trim_whitespace(texts), r"\s+"))
    # ASCII classes so \d/\s match DuckDB's RE2 on non-ASCII text
    piece_re = re.compile(r"[A-Za-z]+|\d+|[^\sA-Za-z\d]", re.ASCII)
    pieces = pa.array([len(piece_re.findall(t)) for t in texts.to_pylist()],
                      type=pa.int64())
    return batch.append_column("n_tokens", ws.cast(pa.int64())).append_column(
        "n_pieces", pieces
    )


def quality_score_batch(batch: pd.DataFrame) -> pd.DataFrame:
    """Length / punctuation / stopword-ratio quality features + blended score.

    Tokenization mirrors the DuckDB oracle exactly: regex-split the
    TRIMMED text on \\s+ (so a whitespace-only doc yields the single
    empty token the oracle's string_split_regex('') produces), and every
    rounded column uses round-half-away (DuckDB round), not numpy's
    half-even."""
    texts = batch["text"]
    n_chars = texts.str.len().astype("int64")
    # ASCII \s on both trim and split: DuckDB's RE2 \s is ASCII-only, so a
    # Unicode-aware strip()/split() would diverge on NBSP-style whitespace
    tokens = texts.str.replace(re.compile(r"^\s+|\s+$", re.ASCII), "",
                               regex=True).str.split(re.compile(r"\s+", re.ASCII))
    n_tokens = tokens.str.len().fillna(0).astype("int64")
    # ASCII \s here too (ADVICE r3): the numerator must strip exactly the
    # characters the tokenizer splits on, or NBSP-style whitespace counts
    # toward mean_token_len while not separating tokens
    mean_tok_len = (texts.str.replace(re.compile(r"\s+", re.ASCII), "",
                                      regex=True).str.len() /
                    n_tokens.clip(lower=1))
    # ASCII \w: matches the DuckDB (RE2) oracle on non-ASCII text
    punct_ratio = texts.str.count(re.compile(r"[^\w\s]", re.ASCII)) / n_chars.clip(lower=1)
    stop = _LANG_PROFILES["en"]
    stop_ratio = tokens.map(
        lambda ws: sum(w.lower() in stop for w in ws) / max(len(ws), 1)
        if isinstance(ws, list) else 0.0
    )
    score = (
        np.clip(n_tokens / 100.0, 0, 1) * 0.4
        + np.clip(1.0 - punct_ratio * 4.0, 0, 1) * 0.3
        + np.clip(stop_ratio * 5.0, 0, 1) * 0.3
    )
    out = batch.copy()
    out["n_chars_q"] = n_chars
    out["n_tokens"] = n_tokens
    out["mean_token_len"] = round_half_away(mean_tok_len, 6)
    out["punct_ratio"] = round_half_away(punct_ratio, 6)
    out["stopword_ratio"] = round_half_away(stop_ratio.astype(float), 6)
    out["quality_score"] = round_half_away(score.astype(float), 6)
    return out


class Fingerprinter:
    """Rolling-hash (winnowing-style) document fingerprints + simhash."""

    def __init__(self, window: int = 8, keep_mod: int = 16):
        self.window = window
        self.keep_mod = keep_mod

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        fps = [rolling_fingerprint(t, self.window, self.keep_mod) for t in texts]
        sims = [simhash64(t.lower().split()) for t in texts]
        return (
            batch.append_column(
                "fingerprint", pa.array(fps, type=pa.list_(pa.int64()))
            )
            .append_column("n_fingerprints",
                           pa.array([len(f) for f in fps], type=pa.int64()))
            .append_column("simhash",
                           pa.array([s - (1 << 63) if s >= (1 << 63) else s for s in sims],
                                    type=pa.int64()))
        )
