"""Property-based tests (hypothesis) — beyond the reference's test
strategy (SURVEY.md §5: pliers ships only golden-scalar unit tests).
These pin structural invariants of the pure-Python kernels that back
the rows-only queries, so the Spark plumbing around them can trust
their totality/idempotence."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from pliers_spark.functions.snowball import snowball_stem
from pliers_spark.functions.spectral import lowpass_sinc_kernel
from pliers_spark.functions.stemming import porter_stem

words = st.text(alphabet=st.characters(min_codepoint=97, max_codepoint=122), min_size=0, max_size=24)


@given(words)
@settings(max_examples=300, deadline=None)
def test_porter_total_and_shrinking(w):
    s = porter_stem(w)
    assert isinstance(s, str)
    assert len(s) <= max(len(w), 1)


@given(words)
@settings(max_examples=300, deadline=None)
def test_snowball_total_lowercase_shrinking(w):
    s = snowball_stem(w)
    assert isinstance(s, str)
    assert s == s.lower()
    assert len(s) <= max(len(w), 2)  # step 1b can append an 'e'


@given(words)
@settings(max_examples=200, deadline=None)
def test_snowball_idempotent_on_short_words(w):
    # stems of length <=2 are fixed points by construction
    s = snowball_stem(w)
    if len(s) <= 2:
        assert snowball_stem(s) == s


@given(st.integers(min_value=2, max_value=16), st.integers(min_value=3, max_value=31).filter(lambda t: t % 2 == 1))
@settings(max_examples=100, deadline=None)
def test_lowpass_kernel_invariants(decimate, taps):
    h = lowpass_sinc_kernel(decimate, taps)
    assert h.shape == (taps,)
    assert abs(h.sum() - 1.0) < 1e-12          # unity DC gain
    assert np.allclose(h, h[::-1])             # symmetric (zero phase)
    # attenuation at the source Nyquist: |H(pi)| well below DC — only
    # meaningful once the kernel has enough taps to realize the cutoff
    # (a 3-tap Blackman-windowed sinc degenerates to identity)
    if taps >= 4 * decimate + 1:
        resp = abs(np.sum(h * np.cos(np.pi * (np.arange(taps) - (taps - 1) / 2))))
        assert resp < 0.7


@given(st.lists(st.floats(min_value=-1e3, max_value=1e3, allow_nan=False), min_size=8, max_size=64))
@settings(max_examples=100, deadline=None)
def test_dft_oracle_matches_numpy_rfft(xs):
    """The explicit-DFT formulation used in the stft_power SQL oracle is
    numerically the same transform as np.fft.rfft (per frame)."""
    x = np.asarray(xs[:8])
    win = 0.5 - 0.5 * np.cos(2 * np.pi * np.arange(8) / 8)
    xw = x * win
    ref = np.abs(np.fft.rfft(xw)) ** 2
    j = np.arange(8)
    for k in range(5):
        re = np.sum(xw * np.cos(2 * np.pi * k * j / 8))
        im = np.sum(xw * np.sin(2 * np.pi * k * j / 8))
        assert abs((re * re + im * im) - ref[k]) < 1e-6 * max(1.0, ref[k])
