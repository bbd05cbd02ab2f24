"""Spec-of-record constants for the transcript quality-filter engine.

Every threshold used by BOTH the pure-pandas oracle (``moira_spark.oracle``)
and the Spark pipeline (``moira_spark.pipeline``) lives here, so the two
implementations cannot drift.  The semantics transpose fpusan/moira's
read-filtering pipeline (per-base quality -> expected errors -> keep/drop,
reference reconstructed from public knowledge; /root/reference is empty, see
SURVEY.md §0) to multi-turn transcript filtering per BASELINE.json:6,14,15.

moira analogy map (reference: moira.py, bernoullimodule.c [M]):
  - per-base Phred quality      -> per-char LM log-prob (``PPL_*``)
  - expected-errors <= uncert*L -> perplexity <= PPL_MAX
  - ambiguous-base (N) count    -> symbol/word ratio rules
  - --truncate length gate      -> length-bounds rule
  - whole-read discard          -> per-turn drop
  - paired-read whole-pair drop -> conversation drop when > K bad turns
"""

from __future__ import annotations

# ---------------------------------------------------------------- rule: length
MIN_CHARS = 10
MAX_CHARS = 20_000
MIN_WORDS = 3
MAX_WORDS = 4_000

# --------------------------------------------------------- rule: symbol ratios
# Gopher-style: too many non-alphanumeric symbols per word, or too many
# '#'/'…' marks per word.  ASCII character classes on both sides (Java regex
# \p{Alnum} is ASCII; the oracle mirrors that explicitly).
MAX_SYMBOL_WORD_RATIO = 0.40
MAX_HASH_ELLIPSIS_WORD_RATIO = 0.10

# ----------------------------------------------------------- rule: repetition
# Gopher-style duplicate-content fractions, computed over characters.
MAX_DUP_LINE_FRAC = 0.30          # fraction of chars in duplicated lines
MAX_TOP_NGRAM_CHAR_FRAC = {       # chars covered by the most frequent n-gram
    2: 0.20,
    3: 0.18,
    4: 0.16,
}
MIN_WORDS_FOR_REPETITION = 20     # below this the n-gram stats are meaningless

# ------------------------------------------------------------- rule: language
LANG_ALLOWLIST = ("en",)
LANG_MIN_CONF = 0.65
LANGID_DIM = 1 << 15              # hashed char-trigram feature space
LANGID_SEED = 42

# ----------------------------------------------------------- rule: perplexity
# Char-bigram LM trained on the seeded clean corpus; moira's Poisson-binomial
# expected-error bound re-expressed as a per-turn perplexity ceiling.
PPL_MAX = 60.0
PPL_MIN_CHARS = 20                # very short turns: ppl unreliable, skip rule
LM_SEED = 42

# ------------------------------------------------------------- rule: toxicity
TOXIC_LEXICON = (
    "frakking", "gorram", "smeghead", "belgium", "felgercarb",
    "shazbot", "frell", "dren", "yotz", "grud",
)
TOXIC_MASK = "[REDACTED]"

# ------------------------------------------------------------------ PII scrub
PII_EMAIL_TOKEN = "<EMAIL>"
PII_PHONE_TOKEN = "<PHONE>"
PII_SSN_TOKEN = "<SSN>"
PII_IP_TOKEN = "<IP>"
PII_CC_TOKEN = "<CC>"

# ------------------------------------------------------- conversation verdict
# moira's whole-read discard on expected-error exceedance, lifted to the
# conversation level: drop the whole conversation when more than
# CONV_MAX_BAD_TURNS turns failed per-turn filtering.
CONV_MAX_BAD_TURNS = 5

# Salt buckets for the two-phase conversation aggregation (hot-conv skew).
CONV_AGG_SALT_BUCKETS = 32

# ------------------------------------------------------------- CLI overrides
# moira exposes its thresholds as command-line options (--truncate,
# --maxerrors/--uncert, paired-discard, ...).  The transposed engine keeps
# the spec defaults above as the single source of truth, but driver.py maps
# the moira-style flag surface onto them via this function.  Overrides
# mutate the module constants BEFORE any pipeline/oracle code reads them —
# and because the pandas oracle and the Spark pipeline import THIS module,
# an override can never make the two sides disagree (the F1/byte-exact
# gates hold under any setting).  The harness DuckDB oracles hold the same
# property since round 5: config-dependent oracle SQL is registered as a
# zero-arg callable rendered at oracle_sql() call time (harness/__init__),
# never an f-string baked at import (ADVICE r4; pinned by
# tests/test_registry.py::test_oracle_sql_tracks_config_overrides).
_OVERRIDABLE = {
    "MIN_CHARS": int,
    "MAX_CHARS": int,
    "MIN_WORDS": int,
    "MAX_WORDS": int,
    "MAX_SYMBOL_WORD_RATIO": float,
    "PPL_MAX": float,
    "PPL_MIN_CHARS": int,
    "LANG_MIN_CONF": float,
    "LANG_ALLOWLIST": tuple,
    "CONV_MAX_BAD_TURNS": int,
    "CONV_AGG_SALT_BUCKETS": int,
}


# value-range validation: a zero/negative threshold would silently disable
# or invert a rule (e.g. salt buckets 0 -> pmod NULL collapses every conv
# onto one bucket; max-chars 0 -> drop everything) — reject loudly instead.
_MIN_ONE = {
    "MIN_CHARS", "MAX_CHARS", "MIN_WORDS", "MAX_WORDS",
    "PPL_MIN_CHARS", "CONV_AGG_SALT_BUCKETS",
}


def apply_overrides(**kwargs) -> dict:
    """Validate and apply CLI threshold overrides; returns what changed.
    Unknown keys, out-of-range values, and a string where a sequence of
    language codes is expected all raise (a typo'd flag must not silently
    run with defaults or shred 'en' into ('e','n')); None values are
    ignored (argparse's unset marker)."""
    changed = {}
    g = globals()
    for key, value in kwargs.items():
        if value is None:
            continue
        if key not in _OVERRIDABLE:
            raise ValueError(f"not an overridable threshold: {key}")
        caster = _OVERRIDABLE[key]
        if caster is tuple:
            if isinstance(value, str):
                raise ValueError(
                    f"{key} takes a sequence of language codes, not a "
                    "string (tuple('en') would shred it per-character)"
                )
            value = tuple(value)
            if not value or not all(isinstance(v, str) and v for v in value):
                raise ValueError(f"{key} must be a non-empty tuple of codes")
        else:
            value = caster(value)
            if key in _MIN_ONE and value < 1:
                raise ValueError(f"{key} must be >= 1, got {value}")
            if key == "CONV_MAX_BAD_TURNS" and value < 0:
                raise ValueError(f"{key} must be >= 0, got {value}")
            if key in ("PPL_MAX",) and value <= 0:
                raise ValueError(f"{key} must be > 0, got {value}")
            if key == "MAX_SYMBOL_WORD_RATIO" and value < 0:
                raise ValueError(f"{key} must be >= 0, got {value}")
            if key == "LANG_MIN_CONF" and not (0.0 <= value <= 1.0):
                raise ValueError(f"{key} must be in [0, 1], got {value}")
        if g[key] != value:
            g[key] = value
            changed[key] = value
    return changed


# Rule names, also the vocabulary of the ``reasons`` column (sorted output).
REASON_LENGTH = "length"
REASON_SYMBOL = "symbol_ratio"
REASON_REPETITION = "repetition"
REASON_LANGUAGE = "language"
REASON_PERPLEXITY = "perplexity"
REASON_TOXICITY = "toxicity"
ALL_REASONS = (
    REASON_LANGUAGE,
    REASON_LENGTH,
    REASON_PERPLEXITY,
    REASON_REPETITION,
    REASON_SYMBOL,
    REASON_TOXICITY,
)
