"""Standalone result comparators — CLI analogs of the reference's
validation tools so a user can check their own output files without
pytest:

- ``eps``:   misc/eps_check.cc:21-57 — per-vertex float compare with
  relative threshold 1e-4, treating near-infinity values (>= 0.999 *
  DBL_MAX, and the strings inf/infinity) as equal to each other and
  near-zero values (< 10 * DBL_MIN) as equal to each other.
- ``wcc-iso``: misc/wcc_check.cc — component-label ISOMORPHISM: two
  labelings agree iff they induce the same partition (built by the
  same first-seen renaming walk as the reference, so mismatch messages
  appear on the same line).
- ``exact``: byte-wise line compare (misc convenience).

File format: whitespace-separated ``<vertex-id> <value>`` lines, the
reference's result-writer format (``%.15e`` floats, ``infinity``
markers) as produced by ``graph/driver.ResultHandle`` +
``sources/reference_format.write_reference_text``.

Usage::

    python -m libgrape_lite_ray.check eps     correct.txt output.txt
    python -m libgrape_lite_ray.check wcc-iso correct.txt output.txt

Exit code 0 = match, 1 = mismatch (same contract as the C++ tools).
"""

from __future__ import annotations

import sys

_DBL_MAX = 1.7976931348623157e308
_MIN_NEAR_INFINITY = _DBL_MAX * 0.999
_MAX_NEAR_ZERO = 2.2250738585072014e-308 * 10
_THRESHOLD = 0.0001


def _parse(val: str) -> float:
    low = val.lower()
    if low in ("inf", "+inf", "infinity", "+infinity"):
        return _DBL_MAX
    if low in ("-inf", "-infinity"):
        return -_DBL_MAX
    return float(low)


def _near_inf(x: float) -> bool:
    return x == _DBL_MAX or abs(x) > _MIN_NEAR_INFINITY


def _match(v1: float, v2: float) -> bool:
    if v1 == v2:
        return True
    if _near_inf(v1) and _near_inf(v2):
        return True
    if abs(v1) < _MAX_NEAR_ZERO and abs(v2) < _MAX_NEAR_ZERO:
        return True
    # NOTE: relative to v1 (the "correct" side), like the reference
    return abs(v1 - v2) < _THRESHOLD * v1


def _rows(path: str):
    with open(path) as f:
        for line in f:
            parts = line.split()
            if parts:
                yield parts[0], parts[1] if len(parts) > 1 else ""


def eps_check(correct: str, output: str) -> int:
    it2 = _rows(output)
    for id1, val1 in _rows(correct):
        row2 = next(it2, None)
        if row2 is None:
            print("Vertex number not match...")
            return 1
        id2, val2 = row2
        if id1 != id2:
            print(f"Vertex id not match: {id1} v.s. {id2}")
            return 1
        if not _match(_parse(val1), _parse(val2)):
            print(f"Value of [vertex-{id1}] not match: {val1} v.s. {val2}")
            return 1
    return 0


def wcc_iso_check(correct: str, output: str) -> int:
    name1: dict[str, int] = {}
    name2: dict[str, int] = {}
    it2 = _rows(output)
    for vid1, cid1 in _rows(correct):
        row2 = next(it2, None)
        if row2 is None:
            print("Vertex number not match...")
            return 1
        vid2, cid2 = row2
        if vid1 != vid2:
            print(f"Vertex id not match: {vid1} v.s. {vid2}")
            return 1
        in1, in2 = cid1 in name1, cid2 in name2
        if not in1 and not in2:
            new_name = len(name1)
            name1[cid1] = new_name
            name2[cid2] = new_name
        elif in1 and in2:
            if name1[cid1] != name2[cid2]:
                print(f"Vertex cluster name not match - A: {vid1} v.s. {vid2}")
                return 1
        else:
            print(f"Vertex cluster name not match - B: {vid1} v.s. {vid2}")
            return 1
    return 0


def exact_check(correct: str, output: str) -> int:
    it2 = _rows(output)
    for row1 in _rows(correct):
        row2 = next(it2, None)
        if row1 != row2:
            print(f"Mismatch: {row1} v.s. {row2}")
            return 1
    if next(it2, None) is not None:
        print("Vertex number not match...")
        return 1
    return 0


def main(argv=None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    if len(argv) != 3 or argv[0] not in ("eps", "wcc-iso", "exact"):
        print("usage: python -m libgrape_lite_ray.check "
              "{eps|wcc-iso|exact} <correct-result> <output-result>")
        return 0
    fn = {"eps": eps_check, "wcc-iso": wcc_iso_check, "exact": exact_check}[argv[0]]
    return fn(argv[1], argv[2])


if __name__ == "__main__":
    sys.exit(main())
