"""Native C++ host runtime, loaded via ctypes.

Builds ``gtrack_parser.cpp`` into a shared library on first use (g++,
cached next to the source; rebuilt when the source is newer).  Every entry
point degrades gracefully: if the toolchain or the build is unavailable,
callers fall back to the pure-Python implementations, which define the
semantics (io/gtrack.py).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from pathlib import Path

import numpy as np

_HERE = Path(__file__).parent
_SRC = _HERE / "gtrack_parser.cpp"
_SRC_VCF = _HERE / "vcf_convert.cpp"
_SRC_MC = _HERE / "mc_native.cpp"


def _host_cpu_tag() -> str:
    """Short tag identifying this host's ISA extensions.

    The library is compiled with -march=native, so a .so cached in the
    package directory must not be served to a host with a different CPU
    (shared NFS installs across a heterogeneous fleet would SIGILL).
    Keyed on the kernel-reported feature flags; falls back to the bare
    machine arch when /proc/cpuinfo is unavailable (macOS et al.)."""
    import hashlib
    import platform

    ident = platform.machine()
    try:
        with open("/proc/cpuinfo") as fh:
            for line in fh:
                if line.startswith(("flags", "Features")):
                    ident += " " + " ".join(sorted(line.split()[2:]))
                    break
    except OSError:
        pass
    return hashlib.sha1(ident.encode()).hexdigest()[:10]


_LIB = _HERE / f"_gtrack_parser_{_host_cpu_tag()}.so"
_lock = threading.Lock()
_lib: ctypes.CDLL | None = None
_build_failed = False


class _GtrackResult(ctypes.Structure):
    _fields_ = [
        ("n_rows", ctypes.c_int64),
        ("pos", ctypes.POINTER(ctypes.c_int64)),
        ("vals", ctypes.POINTER(ctypes.c_double)),
        ("seq_idx", ctypes.POINTER(ctypes.c_int32)),
        ("n_seqids", ctypes.c_int32),
        # POINTER(c_char), not c_char_p: the blob contains interior NULs
        # and c_char_p would truncate at the first one
        ("seqid_blob", ctypes.POINTER(ctypes.c_char)),
        ("blob_len", ctypes.c_int64),
    ]


def _build() -> bool:
    """Compile the native runtime; returns True on success.

    Built on first use on the machine that runs it, so -march=native is
    safe (the MC evaluator's sorting network vectorizes across
    permutations only with the host's SIMD width); retried without the
    flag for toolchains that reject it."""
    base = ["g++", "-O3", "-std=c++17", "-shared", "-fPIC", "-pthread"]
    srcs = [str(_SRC), str(_SRC_VCF), str(_SRC_MC), "-o", str(_LIB)]
    for flags in (["-march=native", "-funroll-loops"], []):
        try:
            subprocess.run(
                base + flags + srcs,
                check=True,
                capture_output=True,
                timeout=120,
            )
            return True
        except (OSError, subprocess.SubprocessError):
            continue
    return False


def _load() -> ctypes.CDLL | None:
    global _lib, _build_failed
    with _lock:
        if _lib is not None:
            return _lib
        if _build_failed:
            return None
        if os.environ.get("DIVERGENCE_TPU_NO_NATIVE"):
            _build_failed = True
            return None
        needs_build = not _LIB.exists() or _LIB.stat().st_mtime < max(
            _SRC.stat().st_mtime,
            _SRC_VCF.stat().st_mtime,
            _SRC_MC.stat().st_mtime,
        )
        if needs_build and not _build():
            _build_failed = True
            return None
        try:
            lib = ctypes.CDLL(str(_LIB))
        except OSError:
            _build_failed = True
            return None
        lib.gtrack_parse.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(_GtrackResult),
            ctypes.c_int,
        ]
        lib.gtrack_parse.restype = ctypes.c_int
        lib.gtrack_free.argtypes = [ctypes.POINTER(_GtrackResult)]
        lib.gtrack_free.restype = None
        lib.vcf_convert.argtypes = [
            ctypes.c_char_p,
            ctypes.c_char_p,
            ctypes.c_char_p,
            ctypes.c_char_p,
            ctypes.c_char_p,
            ctypes.c_longlong,
            ctypes.c_int,
        ]
        lib.vcf_convert.restype = ctypes.c_longlong
        _u32p = ctypes.POINTER(ctypes.c_uint32)
        lib.tf2x32_fold.argtypes = [
            ctypes.c_uint32, ctypes.c_uint32, ctypes.c_uint32, _u32p
        ]
        lib.tf2x32_fold.restype = None
        lib.mc_native.argtypes = [
            ctypes.POINTER(ctypes.c_float),    # dist [B, m, m]
            ctypes.POINTER(ctypes.c_float),    # scores [B]
            _u32p,                             # wkeys [B, 2]
            ctypes.c_int64,                    # B
            ctypes.c_int32,                    # m
            ctypes.c_int32,                    # asize
            ctypes.c_int32,                    # chunk
            ctypes.c_int64,                    # runs
            ctypes.c_int32,                    # threshold
            ctypes.c_int32,                    # n_threads
            ctypes.POINTER(ctypes.c_double),   # pvals out
            ctypes.POINTER(ctypes.c_int64),    # nscores out
            ctypes.POINTER(ctypes.c_int64),    # hits out
        ]
        lib.mc_native.restype = None
        _lib = lib
        return lib


def parse_gtrack_native_indexed(
    path: str | Path, n_threads: int = 0
) -> tuple[list[str], np.ndarray, np.ndarray, np.ndarray] | None:
    """Parse a GTrack valued-points file with the C++ parser.

    Returns (seqid_names, seq_idx int32 [n_rows], pos int64, vals float64)
    in file row order, with seqids interned as indices into
    ``seqid_names`` — integer grouping downstream is ~10x faster than
    object-array comparisons.  None when native parsing is unavailable."""
    lib = _load()
    if lib is None:
        return None
    res = _GtrackResult()
    rc = lib.gtrack_parse(
        str(path).encode(), ctypes.byref(res), int(n_threads)
    )
    if rc != 0:
        return None
    try:
        n = res.n_rows
        pos = np.ctypeslib.as_array(res.pos, shape=(n,)).copy() if n else (
            np.zeros(0, dtype=np.int64)
        )
        vals = np.ctypeslib.as_array(res.vals, shape=(n,)).copy() if n else (
            np.zeros(0, dtype=np.float64)
        )
        seq_idx = (
            np.ctypeslib.as_array(res.seq_idx, shape=(n,)).copy()
            if n
            else np.zeros(0, dtype=np.int32)
        )
        blob = ctypes.string_at(res.seqid_blob, res.blob_len)
        names = [x.decode() for x in blob.split(b"\x00")[: res.n_seqids]]
        return names, seq_idx, pos, vals
    finally:
        lib.gtrack_free(ctypes.byref(res))


def parse_gtrack_native(
    path: str | Path, n_threads: int = 0
) -> tuple[np.ndarray, np.ndarray, np.ndarray] | None:
    """Like :func:`parse_gtrack_native_indexed` but materializes seqids as
    an object array of names (the Python reader's pre-grouping contract)."""
    parsed = parse_gtrack_native_indexed(path, n_threads)
    if parsed is None:
        return None
    names, seq_idx, pos, vals = parsed
    arr = np.asarray(names, dtype=object)
    seq = arr[seq_idx] if len(seq_idx) else np.zeros(0, dtype=object)
    return seq, pos, vals


def vcf_convert_native(
    vcf_path: str | Path,
    out_path: str | Path,
    gtrack_header: str,
    population: list[str],
    n_threads: int = 0,
) -> list[str] | None:
    """Threaded C++ VCF -> GTrack conversion (vcf_convert.cpp).

    Returns the population names found in the header, or None when the
    native path is unavailable or the conversion failed (callers fall
    back to the pure-Python converter, which defines the semantics)."""
    lib = _load()
    if lib is None:
        return None
    # '\n'-separated marshalling: newline cannot appear inside a VCF
    # header column (columns are single-line, tab-separated), unlike ','
    # which is legal in a sample ID; buffer sized in UTF-8 BYTES
    names_blob = "\n".join(population).encode()
    found = ctypes.create_string_buffer(len(names_blob) + 16)
    rows = lib.vcf_convert(
        str(vcf_path).encode(),
        str(out_path).encode(),
        gtrack_header.encode(),
        names_blob,
        found,
        ctypes.c_longlong(len(found)),
        int(n_threads),
    )
    if rows < 0:
        return None
    text = found.value.decode()
    return [n for n in text.split("\n") if n]


def fold_in_native(k0: int, k1: int, data: int) -> tuple[int, int] | None:
    """jax.random.fold_in on raw key words — the stream-parity test hook
    for the C++ Threefry-2x32 (mc_native.cpp)."""
    lib = _load()
    if lib is None:
        return None
    out = (ctypes.c_uint32 * 2)()
    lib.tf2x32_fold(k0, k1, data, out)
    return int(out[0]), int(out[1])


def mc_native(
    dist: np.ndarray,       # [B, m, m]
    scores: np.ndarray,     # [B] observed CSS
    wkeys: np.ndarray,      # [B, 2] uint32 per-window base key words
    asize: int,
    chunk: int,
    runs: int,
    threshold: int,
    n_threads: int = 0,
) -> tuple[np.ndarray, np.ndarray, np.ndarray] | None:
    """Threaded adaptive permutation MC with per-window early exit
    (mc_native.cpp).  Replays the fold_in(seed, chrom, slot, chunk) mix
    stream of the XLA backend exactly; scores accumulate in f64 (the
    XLA path reduces in f32 — see docs/PARITY.md).  Returns
    (pvals f64, nscores i64, hits i64) or None when the native build is
    unavailable (callers fall back to the XLA backend)."""
    lib = _load()
    if lib is None:
        return None
    B, m = dist.shape[0], dist.shape[-1]
    distf = np.ascontiguousarray(dist, dtype=np.float32)
    scoresf = np.ascontiguousarray(scores, dtype=np.float32)
    keysu = np.ascontiguousarray(wkeys, dtype=np.uint32)
    if keysu.shape != (B, 2):
        raise ValueError(f"wkeys must be [B, 2] uint32, got {keysu.shape}")
    pvals = np.zeros(B, dtype=np.float64)
    nsc = np.zeros(B, dtype=np.int64)
    hits = np.zeros(B, dtype=np.int64)
    lib.mc_native(
        distf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        scoresf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        keysu.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
        ctypes.c_int64(B),
        ctypes.c_int32(m),
        ctypes.c_int32(asize),
        ctypes.c_int32(chunk),
        ctypes.c_int64(runs),
        ctypes.c_int32(threshold),
        ctypes.c_int32(n_threads),
        pvals.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        nsc.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        hits.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
    )
    return pvals, nsc, hits


def native_available() -> bool:
    return _load() is not None
