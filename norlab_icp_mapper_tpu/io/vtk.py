"""Legacy-ASCII VTK POLYDATA point-cloud IO.

Replaces the libpointmatcher ``DataPoints::load``/``save`` path used by the
reference (``examples/build_map_from_scans_and_trajectory.cpp:228,235``,
``HardDriveCellManager.cpp:16,25``, ``Trajectory.cpp:52``).  Supports the
subset of the legacy VTK format lpm emits for the bundled example data:

  POINTS n float                      -> positions [n, 3]
  VERTICES n 2n                       -> ignored on read, emitted on write
  POINT_DATA n
    SCALARS <name> <type> [numComp]   -> descriptor [n, numComp]
    LOOKUP_TABLE default              -> skipped
    VECTORS <name> <type>             -> descriptor [n, 3]
    NORMALS <name> <type>             -> descriptor "normals" [n, 3]
    COLOR_SCALARS <name> <k>          -> descriptor [n, k]
    FIELD <name> <k>                  -> k named arrays

Parsing is numpy-vectorized (np.fromstring over the relevant text span) so a
41k-point scan loads in milliseconds, not seconds.
"""
from __future__ import annotations

import io as _io
from typing import Dict, Tuple

import numpy as np

__all__ = ["read_vtk", "write_vtk"]


def _parse_block(lines, start, n_values):
    """Parse whitespace-separated floats from lines[start:] until n_values
    consumed. Returns (array, next_line_index).

    Fast path: VTK writers emit a fixed number of values per line, so the
    line span is computable and the whole section parses with ONE
    ``np.fromstring`` over the joined text (~10x faster than per-line)."""
    # find first non-empty line and its value count
    i = start
    while i < len(lines) and not lines[i].split():
        i += 1
    if i >= len(lines):
        raise ValueError(f"VTK parse error: expected {n_values} values, got 0")
    per_line = len(lines[i].split())
    n_lines = -(-n_values // per_line)
    chunk = "\n".join(lines[i:i + n_lines])
    arr = np.fromstring(chunk, dtype=np.float64, sep=" ")
    if arr.size >= n_values:
        return arr[:n_values], i + n_lines
    # ragged line lengths: fall back to per-line accumulation
    vals = []
    need = n_values
    while need > 0 and i < len(lines):
        row = np.fromstring(lines[i], dtype=np.float64, sep=" ")
        if row.size == 0:
            i += 1
            continue
        vals.append(row)
        need -= row.size
        i += 1
    arr = np.concatenate(vals) if vals else np.zeros((0,))
    if arr.size < n_values:
        raise ValueError(f"VTK parse error: expected {n_values} values, got {arr.size}")
    return arr[:n_values], i


def read_vtk(path: str) -> Tuple[np.ndarray, Dict[str, np.ndarray]]:
    """Read a legacy ASCII VTK POLYDATA/UNSTRUCTURED file.

    Returns ``(positions [n,3] float32, descriptors {name: [n,k] float32})``.
    Uses the native C++ parser (io/native.py) when available; this numpy
    implementation is the fallback and the reference oracle.
    """
    from .native import read_vtk_native
    native = read_vtk_native(path)
    if native is not None:
        return native
    with open(path, "r") as f:
        text = f.read()
    lines = text.splitlines()
    n_points = 0
    positions = None
    descriptors: Dict[str, np.ndarray] = {}
    i = 0
    n_data = 0
    while i < len(lines):
        line = lines[i].strip()
        toks = line.split()
        if not toks:
            i += 1
            continue
        key = toks[0].upper()
        if key == "POINTS":
            n_points = int(toks[1])
            flat, i = _parse_block(lines, i + 1, n_points * 3)
            positions = flat.reshape(n_points, 3).astype(np.float32)
            continue
        if key in ("VERTICES", "LINES", "POLYGONS", "TRIANGLE_STRIPS"):
            # connectivity: toks = [kind, n, total_ints]; skip total_ints ints
            total = int(toks[2])
            _, i = _parse_block(lines, i + 1, total)
            continue
        if key == "POINT_DATA":
            n_data = int(toks[1])
            i += 1
            continue
        if key == "SCALARS":
            name = toks[1]
            ncomp = int(toks[3]) if len(toks) > 3 else 1
            j = i + 1
            if j < len(lines) and lines[j].strip().upper().startswith("LOOKUP_TABLE"):
                j += 1
            flat, i = _parse_block(lines, j, n_data * ncomp)
            descriptors[name] = flat.reshape(n_data, ncomp).astype(np.float32)
            continue
        if key in ("VECTORS", "NORMALS"):
            name = toks[1] if key == "VECTORS" else "normals"
            flat, i = _parse_block(lines, i + 1, n_data * 3)
            descriptors[name] = flat.reshape(n_data, 3).astype(np.float32)
            continue
        if key == "COLOR_SCALARS":
            name = toks[1]
            ncomp = int(toks[2])
            flat, i = _parse_block(lines, i + 1, n_data * ncomp)
            descriptors[name] = flat.reshape(n_data, ncomp).astype(np.float32)
            continue
        if key == "FIELD":
            n_arrays = int(toks[2])
            i += 1
            for _ in range(n_arrays):
                while not lines[i].strip():
                    i += 1
                ftoks = lines[i].split()
                fname, fncomp, fcount = ftoks[0], int(ftoks[1]), int(ftoks[2])
                flat, i = _parse_block(lines, i + 1, fncomp * fcount)
                descriptors[fname] = flat.reshape(fcount, fncomp).astype(np.float32)
            continue
        i += 1
    if positions is None:
        raise ValueError(f"no POINTS section in {path}")
    return positions, descriptors


def write_vtk(path: str, positions: np.ndarray,
              descriptors: Dict[str, np.ndarray] | None = None,
              comment: str = "File created by norlab_icp_mapper_tpu") -> None:
    """Write a legacy ASCII VTK POLYDATA file readable by ParaView and
    libpointmatcher (mirrors the layout of the reference's saved maps)."""
    from .native import write_vtk_native
    if write_vtk_native(path, positions, descriptors):
        return
    positions = np.asarray(positions, dtype=np.float32)
    n = positions.shape[0]
    if positions.shape[1] == 2:  # 2-D clouds save with z=0
        positions = np.concatenate(
            [positions, np.zeros((n, 1), np.float32)], axis=1)
    buf = _io.StringIO()
    buf.write("# vtk DataFile Version 3.0\n")
    buf.write(comment + "\n")
    buf.write("ASCII\nDATASET POLYDATA\n")
    buf.write(f"POINTS {n} float\n")
    np.savetxt(buf, positions, fmt="%.7g")
    buf.write(f"VERTICES {n} {2 * n}\n")
    verts = np.column_stack([np.ones(n, dtype=np.int64), np.arange(n, dtype=np.int64)])
    np.savetxt(buf, verts, fmt="%d")
    desc = descriptors or {}
    if desc:
        buf.write(f"POINT_DATA {n}\n")
        for name, v in desc.items():
            v = np.asarray(v, dtype=np.float32)
            if v.ndim == 1:
                v = v[:, None]
            k = v.shape[1]
            if name == "normals" and k == 3:
                buf.write(f"NORMALS {name} float\n")
                np.savetxt(buf, v, fmt="%.7g")
            elif k == 3:
                buf.write(f"VECTORS {name} float\n")
                np.savetxt(buf, v, fmt="%.7g")
            else:
                buf.write(f"SCALARS {name} float {k}\n")
                buf.write("LOOKUP_TABLE default\n")
                np.savetxt(buf, v, fmt="%.7g")
    with open(path, "w") as f:
        f.write(buf.getvalue())
