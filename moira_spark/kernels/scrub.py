"""PII/toxicity scrubber with byte-exact, order-pinned semantics.

Byte-exactness under overlapping spans (email inside URL, phone adjacent to
SSN — FIXTURES.md §1) is achieved with ONE combined PII alternation applied
in a single left-to-right pass: at each position the first alternative in
priority order wins (CC > SSN > PHONE > EMAIL > IP) and the scan resumes
after the match, so there is no rescanning ambiguity.  The toxic-lexicon
mask is a second pass over the PII-scrubbed text.  The oracle and the Spark
UDF call these very functions, so the two cannot diverge (SURVEY.md §7.8).

Performance: every PII pattern requires a digit or '@', so ``scrub_batch``
accepts a vectorized candidate mask (computed from the packed byte buffer in
``kernels.score``) and skips the PII scan for texts that cannot match —
typically the large majority.  Patterns are compiled once at module import —
loaded once per executor Python worker, never per row/batch
(BASELINE.json:6).
"""

from __future__ import annotations

import re

import numpy as np

from moira_spark import config

# re.ASCII is load-bearing twice over: (1) semantically — SSN/phone/CC/IP
# are ASCII-digit formats and RFC emails are ASCII, so Unicode digits (e.g.
# Arabic-Indic U+0661) must NOT form a "phone number"; (2) it makes the
# vectorized candidate masks in kernels/score.py EXACT — the masks check
# ASCII bytes only, and without re.ASCII a Unicode-digit SSN would match the
# regex while the mask skipped the text (a real missed-scrub, found in
# review), violating the false-positives-only mask contract below.
_PII_PATTERN = re.compile(
    r"""
    (?P<CC>\b(?:\d[ -]?){15}\d\b)                                  # 16-digit card
  | (?P<SSN>\b\d{3}-\d{2}-\d{4}\b)
  | (?P<PHONE>\b(?:\+?1[ .-]?)?\(?\d{3}\)?[ .-]\d{3}[ .-]\d{4}\b)
  | (?P<EMAIL>\b[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}\b)
  | (?P<IP>\b(?:\d{1,3}\.){3}\d{1,3}\b)
    """,
    re.VERBOSE | re.ASCII,
)

_PII_TOKENS = {
    "CC": config.PII_CC_TOKEN,
    "SSN": config.PII_SSN_TOKEN,
    "PHONE": config.PII_PHONE_TOKEN,
    "EMAIL": config.PII_EMAIL_TOKEN,
    "IP": config.PII_IP_TOKEN,
}

# re.ASCII here restricts IGNORECASE to the ASCII fold, matching the 4-byte
# prefix mask in kernels/score.py exactly (without it, Unicode case-folds
# like LATIN SMALL LETTER LONG S or the Kelvin sign would match the regex
# but slip past the byte-level mask and go unredacted).
_TOXIC_PATTERN = re.compile(
    r"\b(?:" + "|".join(re.escape(w) for w in config.TOXIC_LEXICON) + r")\b",
    re.IGNORECASE | re.ASCII,
)


def _pii_replace(m: "re.Match") -> str:
    return _PII_TOKENS[m.lastgroup]


def scrub_text(text: str) -> tuple[str, bool, bool]:
    """Return (scrubbed_text, had_pii, had_toxicity).

    PII spans are replaced by typed tokens; toxic lexicon hits are masked AND
    flagged (toxicity drops the turn, PII alone does not — moira analogy:
    Ns are corrected/penalised, hard failures are discarded).
    """
    scrubbed, n_pii = _PII_PATTERN.subn(_pii_replace, text)
    scrubbed, n_toxic = _TOXIC_PATTERN.subn(config.TOXIC_MASK, scrubbed)
    return scrubbed, n_pii > 0, n_toxic > 0


def scrub_batch(texts, pii_candidate=None, tox_candidate=None):
    """Per-batch loop (Arrow batch granularity, not Spark rows).

    ``pii_candidate``: optional bool array — False guarantees the text
    contains neither a digit nor '@', hence no PII pattern can match and the
    PII pass is skipped.  ``tox_candidate``: False guarantees no toxic-word
    4-byte prefix occurs (case-folded), skipping the toxicity pass.  Output
    is identical with or without the masks (they only admit false
    positives, never false negatives).
    """
    n = len(texts)
    if pii_candidate is None:
        pii_candidate = np.ones(n, dtype=bool)
    if tox_candidate is None:
        tox_candidate = np.ones(n, dtype=bool)
    out_text = [None] * n
    out_pii = np.zeros(n, dtype=bool)
    out_toxic = np.zeros(n, dtype=bool)
    for i, t in enumerate(texts):
        if pii_candidate[i]:
            s, n_pii = _PII_PATTERN.subn(_pii_replace, t)
            out_pii[i] = n_pii > 0
        else:
            s = t
        if tox_candidate[i]:
            s, n_toxic = _TOXIC_PATTERN.subn(config.TOXIC_MASK, s)
            out_toxic[i] = n_toxic > 0
        out_text[i] = s
    return out_text, out_pii, out_toxic
