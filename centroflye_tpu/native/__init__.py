"""ctypes bindings to the native runtime (libcfnative.so).

Native counterparts of the reference's C/C++ inventory (rr.cpp + vendored
edlib + kseq): a streaming gzip FASTA/FASTQ packer and a 64-bit Myers
edit-distance/traceback engine. Python falls back transparently when the
library is not built (`make -C centroflye_tpu/native`); `build_native()`
builds it on demand.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Iterator, Optional, Tuple

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_DIR, "libcfnative.so")

MODE_NW, MODE_SHW, MODE_HW = 0, 1, 2
_MODES = {"NW": MODE_NW, "SHW": MODE_SHW, "HW": MODE_HW}

_lib = None


def load_native(build: bool = False):
    """Load (optionally building) the native library; None if unavailable."""
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH) and build:
        build_native()
    if not os.path.exists(_LIB_PATH):
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    lib.cf_edit_distance.restype = ctypes.c_int32
    lib.cf_edit_distance.argtypes = [
        ctypes.c_void_p, ctypes.c_int32, ctypes.c_void_p, ctypes.c_int32,
        ctypes.c_int32, ctypes.c_int32, ctypes.POINTER(ctypes.c_int32)]
    lib.cf_edit_distance_batch.restype = None
    lib.cf_edit_distance_batch.argtypes = [
        ctypes.c_void_p, ctypes.c_int32, ctypes.c_void_p, ctypes.c_void_p,
        ctypes.c_int32, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
        ctypes.c_void_p, ctypes.c_void_p]
    lib.cf_align_path.restype = ctypes.c_int32
    lib.cf_align_path.argtypes = [
        ctypes.c_void_p, ctypes.c_int32, ctypes.c_void_p, ctypes.c_int32,
        ctypes.c_int32, ctypes.c_char_p, ctypes.c_int32,
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32)]
    lib.cf_reader_open.restype = ctypes.c_void_p
    lib.cf_reader_open.argtypes = [ctypes.c_char_p]
    lib.cf_reader_close.restype = None
    lib.cf_reader_close.argtypes = [ctypes.c_void_p]
    lib.cf_reader_next.restype = ctypes.c_int64
    lib.cf_reader_next.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64, ctypes.c_char_p,
        ctypes.c_int32]
    if hasattr(lib, "cf_pack2bit"):       # absent in stale prebuilt libs
        lib.cf_pack2bit.restype = ctypes.c_int32
        lib.cf_pack2bit.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p]
    if hasattr(lib, "cf_encode_pack_row"):
        lib.cf_encode_pack_row.restype = ctypes.c_int32
        lib.cf_encode_pack_row.argtypes = [
            ctypes.c_char_p, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_void_p, ctypes.c_int64]
    if hasattr(lib, "cf_align_path_batch"):
        lib.cf_align_path_batch.restype = None
        lib.cf_align_path_batch.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int32,
            ctypes.c_int64, ctypes.c_void_p, ctypes.c_int32,
            ctypes.c_int32, ctypes.c_int32, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_char_p,
            ctypes.c_int64]
    if hasattr(lib, "cf_align_path_pairs"):
        lib.cf_align_path_pairs.restype = None
        lib.cf_align_path_pairs.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
            ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_char_p, ctypes.c_int64]
    _lib = lib
    return _lib


def build_native() -> bool:
    """Build libcfnative.so in place; returns success."""
    try:
        subprocess.run(["make", "-C", _DIR], check=True,
                       capture_output=True)
        return True
    except (subprocess.CalledProcessError, FileNotFoundError):
        return False


def native_available() -> bool:
    return load_native() is not None


def get_encode_pack():
    """Raw ctypes cf_encode_pack_row (or None): encode + 2-bit pack an
    ASCII slice straight into a packed row buffer, one scan, no int8
    intermediate. Signature: (seq_bytes, start, length, out_ptr,
    out_bytes) -> 1 if a non-ACGT char was in range (caller routes the
    row to the exact tier), 0 clean, -1 overflow. Callers do their own
    pointer math per row — this is the streaming engine's hot fill path
    (~2 us/10 kb row vs ~35 us for numpy encode + pack)."""
    lib = load_native()
    if lib is None or not hasattr(lib, "cf_encode_pack_row"):
        return None
    return lib.cf_encode_pack_row


def get_pack2bit_row():
    """Raw ctypes cf_pack2bit (or None) for single-row use on int8 code
    arrays (the native-reader input path): caller passes rows=1 and a
    1-element lens array; returns 1 if any in-range code >= 4."""
    lib = load_native()
    if lib is None or not hasattr(lib, "cf_pack2bit"):
        return None
    return lib.cf_pack2bit


def native_edit_distance(query_codes: np.ndarray, target_codes: np.ndarray,
                         mode: str = "HW", k: int = -1
                         ) -> Optional[Tuple[int, int]]:
    """(dist, end) or None if the native lib is unavailable. dist == -1
    means distance > k (banded early-out)."""
    lib = load_native()
    if lib is None:
        return None
    q = np.ascontiguousarray(query_codes, dtype=np.int8)
    t = np.ascontiguousarray(target_codes, dtype=np.int8)
    end = ctypes.c_int32(-1)
    d = lib.cf_edit_distance(
        q.ctypes.data, len(q), t.ctypes.data, len(t),
        _MODES[mode], k, ctypes.byref(end))
    return int(d), int(end.value)


def native_edit_distance_batch(query_codes: np.ndarray,
                               targets: np.ndarray, lens: np.ndarray,
                               mode: str = "HW", k: int = -1):
    """Batch distances: targets (R, L) int8 padded; returns (dists, ends)
    or None if unavailable."""
    lib = load_native()
    if lib is None:
        return None
    q = np.ascontiguousarray(query_codes, dtype=np.int8)
    t = np.ascontiguousarray(targets, dtype=np.int8)
    ln = np.ascontiguousarray(lens, dtype=np.int32)
    R, L = t.shape
    dists = np.empty(R, dtype=np.int32)
    ends = np.empty(R, dtype=np.int32)
    lib.cf_edit_distance_batch(
        q.ctypes.data, len(q), t.ctypes.data, ln.ctypes.data, R, L,
        _MODES[mode], k, dists.ctypes.data, ends.ctypes.data)
    return dists, ends


def native_align_path(query_codes: np.ndarray, target_codes: np.ndarray,
                      mode: str = "NW"):
    """(dist, cigar, t_start, t_end) or None if unavailable/failed."""
    lib = load_native()
    if lib is None:
        return None
    q = np.ascontiguousarray(query_codes, dtype=np.int8)
    t = np.ascontiguousarray(target_codes, dtype=np.int8)
    cap = 16 * (len(q) + len(t)) + 64
    buf = ctypes.create_string_buffer(cap)
    t_start = ctypes.c_int32(0)
    t_end = ctypes.c_int32(0)
    d = lib.cf_align_path(
        q.ctypes.data, len(q), t.ctypes.data, len(t), _MODES[mode],
        buf, cap, ctypes.byref(t_start), ctypes.byref(t_end))
    if d < 0:
        return None
    return int(d), buf.value.decode("ascii"), int(t_start.value), \
        int(t_end.value)


def native_hw_locate(query: str, target: str
                     ) -> Optional[Tuple[int, int, int]]:
    """(dist, t_start, t_end) via the native HW path alignment."""
    from centroflye_tpu.io.encoding import encode
    res = native_align_path(encode(query), encode(target), mode="HW")
    if res is None:
        return None
    d, _, st, en = res
    return d, st, en


def native_iter_seqs(path: str, max_len: int = 1 << 24
                     ) -> Iterator[Tuple[str, np.ndarray]]:
    """Stream (r_id, int8 code array) records via the native reader."""
    lib = load_native()
    if lib is None:
        raise RuntimeError("native library not built")
    handle = lib.cf_reader_open(path.encode())
    if not handle:
        raise FileNotFoundError(path)
    codes = np.empty(max_len, dtype=np.int8)
    id_buf = ctypes.create_string_buffer(4096)
    try:
        while True:
            n = lib.cf_reader_next(handle, codes.ctypes.data, max_len,
                                   id_buf, 4096)
            if n == -1:
                return
            if n == -2:
                codes = np.empty(codes.size * 2, dtype=np.int8)
                continue
            if n < 0:
                raise RuntimeError(f"parse error in {path}")
            yield id_buf.value.decode("ascii"), codes[:n].copy()
    finally:
        lib.cf_reader_close(handle)


def native_pack2bit(codes: np.ndarray, lens: Optional[np.ndarray] = None):
    """Single-pass C++ 2-bit packer (cf_pack2bit). Returns
    (packed (B, L/4) uint8, n_mask (B, L/8) uint8 or None) with the same
    contract as ops/fused_recruit.pack_2bit, or None if the native lib
    is unavailable or lacks the symbol."""
    lib = load_native()
    if lib is None or not hasattr(lib, "cf_pack2bit"):
        return None
    B, L = codes.shape
    if L % 8:
        return None
    codes = np.ascontiguousarray(codes, dtype=np.int8)
    packed = np.empty((B, L // 4), dtype=np.uint8)
    n_mask = np.empty((B, L // 8), dtype=np.uint8)
    lens_ptr = None
    if lens is not None:
        lens = np.ascontiguousarray(lens, dtype=np.int32)
        lens_ptr = lens.ctypes.data
    any_n = lib.cf_pack2bit(codes.ctypes.data, B, L, lens_ptr,
                            packed.ctypes.data, n_mask.ctypes.data)
    if any_n < 0:
        return None
    return packed, (n_mask if any_n else None)


def native_align_path_batch(queries, target_codes: np.ndarray,
                            mode: str = "NW", threads: int = 0):
    """Batch traceback alignments of many queries against one target
    (cf_align_path_batch, threaded). queries: list of int8 code arrays.
    Returns list of (dist, cigar, t_start, t_end) (dist -1 on failure),
    or None if the native lib is unavailable."""
    lib = load_native()
    if lib is None or not hasattr(lib, "cf_align_path_batch"):
        return None
    n = len(queries)
    if n == 0:
        return []
    t = np.ascontiguousarray(target_codes, dtype=np.int8)
    stride = max(int(len(q)) for q in queries)
    stride = max(stride, 1)
    qbuf = np.full((n, stride), 4, dtype=np.int8)
    qlens = np.empty(n, dtype=np.int32)
    for i, q in enumerate(queries):
        qa = np.ascontiguousarray(q, dtype=np.int8)
        qbuf[i, :len(qa)] = qa
        qlens[i] = len(qa)
    cigar_cap = 16 * (stride + len(t)) + 64
    cigars = ctypes.create_string_buffer(n * cigar_cap)
    dists = np.empty(n, dtype=np.int32)
    t_starts = np.empty(n, dtype=np.int32)
    t_ends = np.empty(n, dtype=np.int32)
    lib.cf_align_path_batch(
        qbuf.ctypes.data, qlens.ctypes.data, n, stride,
        t.ctypes.data, len(t), _MODES[mode], threads,
        dists.ctypes.data, t_starts.ctypes.data, t_ends.ctypes.data,
        cigars, cigar_cap)
    raw = cigars.raw     # materialize the buffer ONCE (`.raw` copies)
    out = []
    for i in range(n):
        cig = raw[i * cigar_cap:(i + 1) * cigar_cap].split(
            b"\0", 1)[0].decode("ascii")
        out.append((int(dists[i]), cig, int(t_starts[i]),
                    int(t_ends[i])))
    return out


def native_align_path_pairs(queries, targets, mode: str = "HW",
                            threads: int = 0):
    """Batch traceback alignments over independent (query, target) pairs
    (cf_align_path_pairs, threaded). queries/targets: equal-length lists
    of int8 code arrays. Returns list of (dist, cigar, t_start, t_end)
    (dist -1 on failure), or None if the native lib is unavailable."""
    lib = load_native()
    if lib is None or not hasattr(lib, "cf_align_path_pairs"):
        return None
    n = len(queries)
    if n != len(targets):
        raise ValueError("queries/targets length mismatch")
    if n == 0:
        return []
    qstride = max(1, max(int(len(q)) for q in queries))
    tstride = max(1, max(int(len(t)) for t in targets))
    qbuf = np.full((n, qstride), 4, dtype=np.int8)
    tbuf = np.full((n, tstride), 4, dtype=np.int8)
    qlens = np.empty(n, dtype=np.int32)
    tlens = np.empty(n, dtype=np.int32)
    for i, (q, t) in enumerate(zip(queries, targets)):
        qa = np.ascontiguousarray(q, dtype=np.int8)
        ta = np.ascontiguousarray(t, dtype=np.int8)
        qbuf[i, :len(qa)] = qa
        tbuf[i, :len(ta)] = ta
        qlens[i] = len(qa)
        tlens[i] = len(ta)
    # a length-L run costs len(str(L)) + 1 <= 3*L bytes for L == 1 and
    # strictly less per-base beyond; 4x the op bound is safely above
    cigar_cap = 4 * (qstride + tstride) + 64
    cigars = ctypes.create_string_buffer(n * cigar_cap)
    dists = np.empty(n, dtype=np.int32)
    t_starts = np.empty(n, dtype=np.int32)
    t_ends = np.empty(n, dtype=np.int32)
    lib.cf_align_path_pairs(
        qbuf.ctypes.data, qlens.ctypes.data, qstride,
        tbuf.ctypes.data, tlens.ctypes.data, tstride,
        n, _MODES[mode], threads,
        dists.ctypes.data, t_starts.ctypes.data, t_ends.ctypes.data,
        cigars, cigar_cap)
    raw = cigars.raw     # materialize the buffer ONCE (`.raw` copies)
    out = []
    for i in range(n):
        cig = raw[i * cigar_cap:(i + 1) * cigar_cap].split(
            b"\0", 1)[0].decode("ascii")
        out.append((int(dists[i]), cig, int(t_starts[i]),
                    int(t_ends[i])))
    return out
