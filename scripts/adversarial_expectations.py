"""Documented-refusal expectations for the adversarial sweep.

EXPECTED[variant][entry_name] = regex that the raised error must match
for the row to classify as `xfail` (a CORRECT loud refusal) instead of
FAIL. Every entry here is a deliberate contract: the operator's
documented preconditions exclude this degenerate input, and it refuses
loudly rather than returning garbage. Keep this list SHORT — a refusal
is only correct when the operation is genuinely undefined on the
input, not merely inconvenient.
"""

from __future__ import annotations

EXPECTED: dict[str, dict[str, str]] = {
    "empty": {},
    "single": {},
    "allnull": {},
    "zerovar": {},
    "unicode": {},
    "dupkeys": {},
}
