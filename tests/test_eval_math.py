"""Pure-python validation of the round-9 eval estimators' math —
no Spark: these pin the FORMULAS against independent references, so a
future refactor of the relational implementations can't silently
change the statistic being computed.

* pass@k: the left-associated falling-factorial product used by
  eval_pass_at_k (llm175) equals the exact binomial form
  1 - C(n-c,k)/C(n,k) (Chen et al. 2021).
* Krippendorff's alpha: the closed-form coincidence-diagonal identity
  used by agg_krippendorff_alpha equals the textbook pairwise
  definition (sum over within-unit ordered pairs weighted 1/(m_u-1)).
"""

from __future__ import annotations

import math
import random
from collections import Counter, defaultdict


def _pass_at_k_product(n: int, c: int, k: int) -> float:
    """The exact expression eval_pass_at_k evaluates relationally."""
    if n - c < k:
        return 1.0
    prod = None
    for i in range(k):
        term = float(n - c - i) / (n - i)
        prod = term if prod is None else prod * term
    return 1.0 - prod


def test_pass_at_k_matches_binomial_form():
    rng = random.Random(9)
    for _ in range(500):
        n = rng.randint(1, 200)
        c = rng.randint(0, n)
        k = rng.choice([1, 5, 10])
        got = _pass_at_k_product(n, c, k)
        if n - c < k:
            want = 1.0
        else:
            want = 1.0 - math.comb(n - c, k) / math.comb(n, k)
        assert abs(got - want) < 1e-12, (n, c, k, got, want)


def test_pass_at_k_edges():
    assert _pass_at_k_product(10, 0, 5) == 0.0  # no successes
    assert _pass_at_k_product(10, 10, 5) == 1.0  # all successes
    assert _pass_at_k_product(3, 1, 5) == 1.0  # n - c < k clamps to 1
    assert abs(_pass_at_k_product(10, 1, 1) - 0.1) < 1e-15


def _alpha_closed(units: list[list[str]]) -> float:
    """The closed form agg_krippendorff_alpha evaluates relationally:
    alpha = 1 - (n-1)(n - O_diag) / (n^2 - sum_c n_c^2)."""
    units = [u for u in units if len(u) >= 2]
    n = sum(len(u) for u in units)
    o_diag = 0.0
    for u in units:
        cc = Counter(u)
        o_diag += sum(v * (v - 1) for v in cc.values()) / (len(u) - 1)
    nc = Counter()
    for u in units:
        nc.update(u)
    s2 = sum(v * v for v in nc.values())
    return 1 - (n - 1) * (n - o_diag) / (n * n - s2)


def _alpha_pairwise(units: list[list[str]]) -> float:
    """Textbook definition: coincidence matrix from within-unit ordered
    pairs weighted 1/(m_u - 1); alpha = 1 - D_o/D_e."""
    units = [u for u in units if len(u) >= 2]
    n = sum(len(u) for u in units)
    o = defaultdict(float)
    for u in units:
        m = len(u)
        for i, ci in enumerate(u):
            for j, cj in enumerate(u):
                if i != j:
                    o[(ci, cj)] += 1.0 / (m - 1)
    nc = Counter()
    for u in units:
        nc.update(u)
    d_o = sum(v for (a, b), v in o.items() if a != b) / n
    d_e = sum(
        nc[a] * nc[b] for a in nc for b in nc if a != b
    ) / (n * (n - 1))
    return 1 - d_o / d_e


def test_krippendorff_closed_form_matches_pairwise():
    rng = random.Random(175)
    for _ in range(60):
        units = [
            [rng.choice("abc") for _ in range(rng.randint(1, 6))]
            for _ in range(rng.randint(3, 40))
        ]
        # need at least two pairable units and two categories
        flat = [c for u in units if len(u) >= 2 for c in u]
        if len(set(flat)) < 2:
            continue
        a, b = _alpha_pairwise(units), _alpha_closed(units)
        assert abs(a - b) < 1e-10, (a, b, units)


def test_krippendorff_perfect_and_none():
    # perfect agreement -> alpha = 1 regardless of unit sizes
    assert _alpha_closed([["a", "a"], ["b", "b", "b"], ["c", "c"]]) == 1.0
    # systematic disagreement on a 2-category, 2-rating design -> < 0
    assert _alpha_closed([["a", "b"], ["b", "a"], ["a", "b"]]) < 0
