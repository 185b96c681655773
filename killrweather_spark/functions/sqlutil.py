"""Small shared helpers for composing the DuckDB oracle SQL strings."""

from __future__ import annotations

import re


def qualify_pred(pred: str, alias: str, col: str = "vec_id") -> str:
    """Qualify bare references to ``col`` in a predicate with ``alias``.

    The ANN/mining oracles template a caller-supplied predicate (e.g.
    ``"vec_id < 20"``) into a CTE where the column must be qualified
    (``a.vec_id``).  A naive ``str.replace`` corrupts identifiers that
    merely CONTAIN the column name (``other_vec_id`` → ``other_a.vec_id``)
    and double-qualifies already-qualified references (``a.vec_id`` →
    ``a.a.vec_id``); this matches only the bare whole-token form — not
    preceded by a word char or ``.``, not followed by a word char.
    """
    return re.sub(
        rf"(?<![\w.]){re.escape(col)}(?!\w)", f"{alias}.{col}", pred
    )
