"""MetricKit crash-report JSON flattening.

From-scratch implementation of the reference's walk
(dsymprocessor/logs_processor.go:292-316,350-398): a crash report is
``{"callStacks": [...]}``; each call stack carries either the original
Apple recursive form (``callStackRootFrames`` with nested ``subFrames`` —
walked by taking the FIRST sub-frame at each level) or the flattened OTel
form (``callStackFrames``).  Both may be present; the Apple walk runs
first, then the flat list is appended (logs_processor.go:366-393).

Offset preference: ``offsetIntoBinaryTextSegment`` over ``offsetAddress``,
0 when neither is present (logs_processor.go:276-283,441-447).
"""

from __future__ import annotations

import json


def _offset(frame: dict) -> int:
    off = frame.get("offsetIntoBinaryTextSegment")
    if off is None:
        off = frame.get("offsetAddress")
    return int(off) if off is not None else 0


def flatten_metrickit(text: str) -> tuple[list[list[dict]] | None, str | None]:
    """Returns ``(stacks, error)``: one frame list per callStack (possibly
    empty — an empty call stack still contributes an empty entry to the
    output join, logs_processor.go:357-398).  Each frame is
    ``{stack_idx, bin, buuid, offset}`` in symbolication order."""
    try:
        report = json.loads(text)
    except (ValueError, TypeError) as e:
        return None, f"invalid MetricKit JSON: {e}"
    if not isinstance(report, dict):
        return None, "invalid MetricKit JSON: not an object"
    call_stacks = report.get("callStacks") or []
    if not isinstance(call_stacks, list):
        return None, "invalid MetricKit JSON: callStacks is not a list"
    stacks: list[list[dict]] = []
    for si, cs in enumerate(call_stacks):
        stack: list[dict] = []
        stacks.append(stack)
        if not isinstance(cs, dict):
            continue
        roots = cs.get("callStackRootFrames")
        if roots:
            frame = roots[0]
            while frame is not None:
                stack.append(
                    {
                        "stack_idx": si,
                        "bin": frame.get("binaryName") or "",
                        "buuid": frame.get("binaryUUID") or "",
                        "offset": _offset(frame),
                    }
                )
                subs = frame.get("subFrames")
                frame = subs[0] if subs else None
        flat = cs.get("callStackFrames")
        if flat:
            for frame in flat:
                stack.append(
                    {
                        "stack_idx": si,
                        "bin": frame.get("binaryName") or "",
                        "buuid": frame.get("binaryUUID") or "",
                        "offset": _offset(frame),
                    }
                )
    return stacks, None
