"""CI variant of the constrained-heap completion gate.

The 4 GiB protocol (tools/constrained_gate.py) caught a real per-task
memory defect in each of its first three uses — all in code that was
green on a full heap at every gated SF. This test keeps the sf0.01
variant running on every pytest run so the protocol can never silently
lapse between rounds; per-round maintenance runs the sf0.1 (and, when
warranted, sf1) variants by hand.

Runs in a SUBPROCESS by design: the heap cap must be set before the
JVM launches, so it cannot share the session-scoped fixture.

Marked ``gate`` (round-14 ADVICE): it forks a full Spark JVM and
oracle-compares the costliest registry queries, so targeted unit runs
can deselect it with ``-m 'not gate'``; plain ``pytest tests/`` (CI,
the driver) still runs everything.
"""

from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent


@pytest.mark.gate
def test_constrained_gate_sf001():
    import sys

    sys.path.insert(0, str(REPO))
    from tools.constrained_gate import run_gate

    assert run_gate(None, sf="0.01", mem="4g") == 0
