"""Property-based tests (hypothesis) for the pure-Python kernels.

These run without Spark — the same functions back the Arrow UDFs, so
invariants proved here transfer to the distributed path.
"""

import string

from hypothesis import given, settings
from hypothesis import strategies as st

from entitylinking_spark.functions.strings import _jaro, jaro_winkler
from entitylinking_spark.operators.ranking import (
    fit_bradley_terry,
    fit_plackett_luce,
)

short_text = st.text(alphabet=string.ascii_lowercase + "_0123456789", max_size=24)


@given(short_text, short_text)
@settings(max_examples=300, deadline=None)
def test_jaro_winkler_symmetric_and_bounded(a, b):
    x = jaro_winkler(a, b)
    y = jaro_winkler(b, a)
    assert abs(x - y) < 1e-12
    assert 0.0 <= x <= 1.0 + 1e-12


@given(short_text)
@settings(max_examples=100, deadline=None)
def test_jaro_winkler_identity(a):
    assert jaro_winkler(a, a) == (1.0 if a else 1.0)


@given(short_text, short_text)
@settings(max_examples=200, deadline=None)
def test_jaro_monotone_under_winkler_boost(a, b):
    assert jaro_winkler(a, b) >= _jaro(a, b) - 1e-12


@given(st.lists(
    st.tuples(st.sampled_from("abcde"), st.sampled_from("abcde")).filter(lambda t: t[0] != t[1]),
    min_size=1, max_size=20,
))
@settings(max_examples=50, deadline=None)
def test_bradley_terry_valid_distribution(pairs):
    exps = [([w], [l]) for w, l in pairs]
    s = fit_bradley_terry(exps)
    assert abs(sum(s.values()) - 1.0) < 1e-6
    assert all(v >= 0 for v in s.values())


@given(st.lists(
    st.tuples(st.sampled_from("abcd"), st.sampled_from("abcd")).filter(lambda t: t[0] != t[1]),
    min_size=1, max_size=15,
))
@settings(max_examples=50, deadline=None)
def test_plackett_luce_valid_distribution(pairs):
    exps = [([w], [l]) for w, l in pairs]
    s = fit_plackett_luce(exps)
    assert abs(sum(s.values()) - 1.0) < 1e-6


def test_bt_dominant_winner():
    exps = [(["a"], ["b", "c", "d"])] * 5
    s = fit_bradley_terry(exps)
    assert s["a"] == max(s.values())
