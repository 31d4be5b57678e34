"""Fusion-aware HBM traffic estimate from optimized HLO text.

`compiled.cost_analysis()['bytes accessed']` is fusion-unaware on some
paths and produced physically impossible rooflines (round-4 verdict:
FADNet "801% of roofline"). This walks the POST-OPTIMIZATION HLO instead:

- only top-level instructions of the entry computation and of while-loop
  bodies/conditions (weighted by their known trip count) are charged —
  computations referenced by fusion ops are already fused, so a fusion
  op is charged exactly its operands + outputs;
- buffers annotated S(1)/S(2) (scoped VMEM / SMEM) are free;
- pure aliasing ops (bitcast, get-tuple-element, tuple, parameter,
  after-all, ...) are free; `copy` is charged (it is real traffic).

The result is an HBM-traffic ESTIMATE (re-reads of the same buffer by
different consumers are charged each time; XLA multi-output fusion and
runtime caching can beat it), good enough to rank rows and bound
attainable latency for docs/BENCHMARKS.json.
"""

from __future__ import annotations

import re

_DTYPE_BYTES = {
    "pred": 1, "s8": 1, "u8": 1, "s16": 2, "u16": 2, "s32": 4, "u32": 4,
    "s64": 8, "u64": 8, "f8e4m3fn": 1, "f8e5m2": 1, "bf16": 2, "f16": 2,
    "f32": 4, "f64": 8, "c64": 8, "c128": 16, "token": 0, "opaque": 0,
}

_FREE_OPS = {
    "parameter", "constant", "get-tuple-element", "tuple", "bitcast",
    "after-all", "partition-id", "replica-id", "iota", "rng-get-and-update-state",
}

_SHAPE_RE = re.compile(r"([a-z0-9]+)\[([0-9,]*)\](?:\{([^}]*)\})?")


def _shape_bytes(s: str) -> int:
    """Total bytes of one or more shapes in a (possibly tuple) shape str.

    Shapes whose layout carries S(1)/S(2) (scoped VMEM/SMEM) count 0.
    """
    total = 0
    for m in _SHAPE_RE.finditer(s):
        dtype, dims, layout = m.group(1), m.group(2), m.group(3) or ""
        if dtype not in _DTYPE_BYTES:
            continue
        if "S(" in layout:
            continue  # not HBM
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * _DTYPE_BYTES[dtype]
    return total


def _parse_computations(hlo: str):
    """→ {name: [(op_kind, out_shape_str, [operand_names], raw_line)]},
    entry_name, plus {instr_name: out_shape_str} across all computations."""
    comps = {}
    shapes = {}
    entry = None
    cur = None
    for line in hlo.splitlines():
        stripped = line.strip()
        m = re.match(r"(ENTRY )?%?([\w.\-]+)\s*\(.*\)\s*->.*{$", stripped)
        if m and not stripped.startswith("%") or (m and stripped.startswith("%") and stripped.endswith("{")):
            cur = m.group(2)
            comps[cur] = []
            if m.group(1):
                entry = cur
            continue
        if stripped == "}" or stripped.startswith("}"):
            cur = None
            continue
        if cur is None:
            continue
        im = re.match(r"(?:ROOT )?%?([\w.\-]+) = ((?:\([^=]*?\)|\S+?)) ([\w\-]+)\((.*)", stripped)
        if not im:
            continue
        name, shape_str, op, rest = im.groups()
        shapes[name] = shape_str
        operands = re.findall(r"%([\w.\-]+)", rest.split("metadata=")[0]
                              .split("calls=")[0].split("body=")[0]
                              .split("condition=")[0].split("to_apply=")[0])
        comps[cur].append((op, shape_str, operands, stripped))
    return comps, entry, shapes


def fused_hbm_bytes(hlo: str) -> int:
    """Estimated HBM bytes moved by one execution of the entry computation."""
    comps, entry, shapes = _parse_computations(hlo)
    if entry is None:
        return 0

    def comp_bytes(cname: str, depth: int = 0) -> int:
        if depth > 8 or cname not in comps:
            return 0
        total = 0
        for op, shape_str, operands, raw in comps[cname]:
            if op in _FREE_OPS:
                continue
            if op == "while":
                trips = 1
                tm = re.search(r'known_trip_count[^0-9]*"?(\d+)"?', raw)
                if tm:
                    trips = int(tm.group(1))
                bm = re.search(r"body=%?([\w.\-]+)", raw)
                cm = re.search(r"condition=%?([\w.\-]+)", raw)
                if bm:
                    total += trips * comp_bytes(bm.group(1), depth + 1)
                if cm:
                    total += trips * comp_bytes(cm.group(1), depth + 1)
                continue
            if op in ("call", "conditional"):
                for t in re.findall(r"(?:to_apply|calls)=%?([\w.\-]+)", raw):
                    total += comp_bytes(t, depth + 1)
                continue
            out_b = _shape_bytes(shape_str)
            in_b = sum(_shape_bytes(shapes.get(o, "")) for o in operands)
            total += out_b + in_b
        return total

    return comp_bytes(entry)


if __name__ == "__main__":
    import sys

    print(fused_hbm_bytes(open(sys.argv[1]).read()))
