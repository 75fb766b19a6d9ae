"""Column-expression helpers for higher-order-function hot paths.

Spark evaluates HOF lambdas *interpreted*, and a lambda body re-evaluates
every captured NON-ATTRIBUTE subtree once per element — only bound lambda
variables and column references are cheap. So

    toks = F.split(...)                       # inline expression
    F.transform(F.sequence(0, F.size(toks) - n),
                lambda i: F.slice(toks, i + 1, n))

re-runs the split once per n-gram position: O(len²) per row. The classic
fix is staging the subtree as a real projection column (see
``operators/text.py:winnow_fingerprints``), but that forces the operator
into DataFrame form. ``bind_col`` gives the same once-per-row evaluation
for pure *Column* expressions: wrap the subtree in a one-element array
and receive it as a bound lambda variable.

Measured on sf0.1 documents (round 14): bigram repetition via
``word_ngrams_col`` 3.6 s → 0.55 s (6.5×) with bit-identical results;
the bloom sidecar build had the same defect class in its explode input
(fixed separately in ``plans/blooms.py`` — generator inputs are not
subexpression-eliminated either).
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import Column
from pyspark.sql import functions as F


def bind_col(col: Column, f: "Callable[[Column], Column]") -> Column:
    """Evaluate ``col`` ONCE per row and pass the result to ``f`` as a
    bound lambda variable (cheap to reference any number of times, from
    any nesting depth of inner HOF lambdas).

    Semantics are identical to inlining ``col`` everywhere ``f``
    references its argument — including NULL propagation: a NULL ``col``
    reaches ``f`` as a NULL element, exactly as the inlined subtree
    would evaluate.
    """
    return F.element_at(F.transform(F.array(col), f), 1)
