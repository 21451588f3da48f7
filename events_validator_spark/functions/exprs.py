"""Expression-building utilities.

``let_`` is the key trick for large compiled expressions: referencing an
expensive sub-expression N times normally clones its whole tree N times
(Catalyst's CollapseProject re-inlines aliased projections), which explodes
analysis/codegen time — e.g. a MinHash signature (32 array_mins over a shingle
transform) referenced once per LSH band multiplied the plan by ~1000×. Binding
the value as a higher-order-function lambda variable makes Catalyst evaluate
it exactly once per row, like a SQL ``LATERAL``/``LET``.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import Column, functions as F


def let_(value: Column, body: Callable[[Column], Column]) -> Column:
    """Evaluate ``value`` once per row and pass it to ``body`` as a variable.

    Implemented as ``transform(array(value), v -> body(v))[0]`` — the lambda
    variable is a true runtime binding, not an expression alias, so the
    optimizer cannot re-inline it.
    """
    return F.transform(F.array(value), body)[0]
