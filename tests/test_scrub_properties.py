"""Property-based tests (hypothesis) for the PII rules: inject a known
number of synthetic PII spans into random benign word soup and require
the counts to match the injection exactly and the scrub to remove every
injected span. Driver-side (python re) against the same pattern strings
Spark/DuckDB execute — the dialect parity itself is pinned by the
doc_pii_scrub hash gate; this pins the RULES."""

import re

from hypothesis import given, settings
from hypothesis import strategies as st

from distributedvectordatabase_spark.functions.text import PII_RULES

RULES = {k: (p, t) for k, p, t in PII_RULES}

word = st.text(alphabet="abcdefghij", min_size=1, max_size=8)
words = st.lists(word, min_size=1, max_size=20)

email = st.builds(
    lambda u, d: f"{u}@{d}.example.com", word, word
)
ip = st.builds(
    lambda a, b, c, d: f"{a}.{b}.{c}.{d}",
    *[st.integers(min_value=0, max_value=255) for _ in range(4)],
)
phone = st.builds(
    lambda a, b: f"+{a} {b:04d} {b:04d}",
    st.integers(min_value=1, max_value=99),
    st.integers(min_value=0, max_value=9999),
)
idnum = st.integers(min_value=10**8, max_value=10**14).map(str)


def _apply_rules(text: str) -> tuple[str, dict]:
    counts = {}
    for kind, pattern, token in PII_RULES:
        counts[kind] = len(re.findall(pattern, text))
        text = re.sub(pattern, token, text)
    return text, counts


@given(words, st.lists(email, max_size=3), st.lists(ip, max_size=3),
       st.lists(phone, max_size=3), st.lists(idnum, max_size=3))
@settings(max_examples=200, deadline=None)
def test_injected_pii_counted_and_removed(ws, emails, ips, phones, ids):
    # benign soup of lowercase alpha words carries no digits/@ — every
    # PII hit must come from an injection; separate spans with ' . '
    # so adjacent injections can't merge into one match
    spans = ws + emails + ips + phones + ids
    text = " . ".join(spans)
    scrubbed, counts = _apply_rules(text)
    assert counts["email"] == len(emails)
    assert counts["ip"] == len(ips)
    assert counts["phone"] == len(phones)
    assert counts["idnum"] == len(ids)
    # nothing PII-shaped survives the scrub
    for kind, (pattern, token) in RULES.items():
        assert not re.search(pattern, scrubbed), (kind, scrubbed)


@given(words)
@settings(max_examples=100, deadline=None)
def test_benign_text_untouched(ws):
    text = " ".join(ws)
    scrubbed, counts = _apply_rules(text)
    assert scrubbed == text
    assert sum(counts.values()) == 0
