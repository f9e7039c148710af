"""HLO collective audit — count/locate the collectives GSPMD inserted.

Unintended resharding collectives (all-to-alls in particular) are both a perf
bug on real ICI and, on the XLA:CPU virtual-device backend used by the
hermetic multi-chip tests, a deadlock hazard when the host has fewer cores
than rendezvous participants (a blocked participant can starve the thread
pool). `collective_counts` parses a compiled module's HLO text so tests can
assert the expected collective inventory (all-reduces for DP grad sync,
collective-permutes for SP halo exchange, and nothing else unless explicitly
intended). See tests/test_sharding.py::test_hlo_collectives.
"""

from __future__ import annotations

import re
from typing import Dict, List, Tuple

# HLO opcode names as they appear in compiled module text ("op-name = ... ").
COLLECTIVE_OPS = (
    "all-reduce",
    "all-gather",
    "all-to-all",
    "reduce-scatter",
    "collective-permute",
    "collective-broadcast",
)

_OP_RE = re.compile(
    r"^\s*(?:ROOT\s+)?%?[\w.\-]+\s*=\s*[^=]*?\b("
    + "|".join(re.escape(o) for o in COLLECTIVE_OPS)
    + r")(?:-start|-done)?\(",
    re.M,
)


def collective_counts(hlo_text: str) -> Dict[str, int]:
    """Count collective ops in HLO text, keyed by base opcode.

    Async pairs (``-start``/``-done``) are counted once (the ``-start``).
    """
    counts: Dict[str, int] = {}
    for m in _OP_RE.finditer(hlo_text):
        line = hlo_text[m.start():hlo_text.find("\n", m.start())]
        if "-done(" in line:
            continue
        counts[m.group(1)] = counts.get(m.group(1), 0) + 1
    return counts


def collective_lines(hlo_text: str, op: str) -> List[str]:
    """Full HLO lines for one collective opcode (metadata carries the
    source location that introduced the resharded value)."""
    out = []
    for line in hlo_text.splitlines():
        if f" {op}(" in line or f"{op}-start(" in line or re.search(
            rf"=\s*[^=]*\b{re.escape(op)}(-start)?\(", line
        ):
            if f"{op}-done(" not in line:
                out.append(line.strip())
    return out


def audit_compiled(compiled) -> Tuple[Dict[str, int], str]:
    """(collective counts, hlo text) for a jax compiled/lowered object."""
    text = compiled.as_text()
    return collective_counts(text), text
