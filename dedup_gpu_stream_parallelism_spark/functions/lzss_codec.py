"""Bit-exact LZSS codec — the reference's benchmark-default ``.ddp`` codec.

The reference's ``-w lzss`` mode (/root/reference/src/dedup.cpp:113-114,
``COMPRESS_LZSS = 3`` src/dedupdef.h:217) compresses every unique chunk
with ``LzssEncodeMemory`` (/root/reference/libs/lzsslib/src/lzss.cpp:454-
595) and decodes with ``LzssDecodeMemory`` (:347-452).  This module
re-implements that codec's *observable byte stream* from the spec below —
derived by reading the reference's behavior, not by translating its code.

Token stream (bits packed MSB-first into bytes, final byte zero-padded —
BitMemoryPutBit/BitMemoryToArray, libs/lzsslib/src/bitmemory.cpp:609-640,
:338-372):

* uncoded  — flag bit ``1`` + 8 literal bits (MSB-first);
* coded    — flag bit ``0`` + 12-bit window offset + 4-bit
  ``length - (MAX_UNCODED + 1)``.  Multi-bit numbers use the little-endian
  Put/GetBitsNum path (bitmemory.cpp:985-1046): the low 8 bits of the
  offset are written first (MSB-first within the byte), then bits 11..8;
  the 4-bit length field is its low nibble MSB-first.

Matcher semantics (FindMatch, libs/lzsslib/src/brute.cpp:166-240, the
variant ``LzssEncodeMemory`` links):

* 4096-byte circular window pre-filled with ``' '`` (0x20), 18-byte
  lookahead ring (lzlocal.h:47-59: OFFSET_BITS=12, LENGTH_BITS=4,
  WINDOW_SIZE=4096, MAX_UNCODED=2, MAX_CODED=18);
* the scan starts at ``windowHead`` (the *oldest* byte) and walks the
  window circularly, so among equally long matches the oldest one wins,
  and the scan stops at the first match reaching MAX_CODED;
* match extension reads the window circularly — near the head it wraps
  into bytes from 4096 positions back (the C code does not clamp this);
* emitted offsets are *absolute circular-window indices*, not distances;
* matches longer than the remaining input are clamped after selection
  ("garbage beyond last data happened to extend match length",
  lzss.cpp:515), so tail tokens can select an offset based on stale
  lookahead-ring bytes; the ring's stale slots hold the most recently
  consumed input bytes — modeled faithfully here.  (Slots never written
  because the input is shorter than 18 bytes are uninitialized C stack
  memory in the reference; here they are deterministic zeros.  Emitted
  lengths are clamped before writing, so decode is unaffected either way.)

Decode mirrors LzssDecodeMemory: same pre-filled window, tokens read until
the bit stream is exhausted, a mid-token EOF discards the partial token
(zero pad bits always parse as an ENCODED flag that then hits EOF).

Cost model: encode is O(tokens · window) with the inner scan vectorized in
numpy (candidate set refined byte-by-byte, ≤ 17 refinement rounds, each a
boolean gather over the surviving candidates); decode is O(output) with a
plain int bit-accumulator.  Both are called per unique chunk (~KBs) inside
Arrow-batched UDFs — never per row of a driver loop.
"""

from __future__ import annotations

import numpy as np

OFFSET_BITS = 12
LENGTH_BITS = 4
WINDOW_SIZE = 1 << OFFSET_BITS      # 4096
MAX_UNCODED = 2
MAX_CODED = (1 << LENGTH_BITS) + MAX_UNCODED  # 18
_SPACE = 0x20
# above this, the encode skip-filter's O(n) int64 temporaries (~80 B per
# input byte) would rival executor memory — fall back to per-token scans
_SKIP_FILTER_MAX_BYTES = 64 << 20


class _BitWriter:
    """MSB-first bit packer (BitMemoryPutBit semantics, final byte
    left-shifted so pad bits are zeros — bitmemory.cpp:338-358)."""

    __slots__ = ("out", "acc", "nbits")

    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, value: int, count: int) -> None:
        self.acc = (self.acc << count) | (value & ((1 << count) - 1))
        self.nbits += count
        while self.nbits >= 8:
            self.nbits -= 8
            self.out.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def put_bit_array(self, bits: np.ndarray) -> None:
        """Append an MSB-first 0/1 uint8 array in one numpy pass —
        whole literal runs go through packbits instead of per-byte
        python calls."""
        if self.nbits:
            lead = np.empty(self.nbits, dtype=np.uint8)
            for i in range(self.nbits):  # <= 7 buffered bits
                lead[i] = (self.acc >> (self.nbits - 1 - i)) & 1
            bits = np.concatenate([lead, bits])
            self.acc = 0
            self.nbits = 0
        nbytes = bits.size // 8
        self.out += np.packbits(bits[: nbytes * 8]).tobytes()
        for b in bits[nbytes * 8 :]:  # <= 7 tail bits back into the buffer
            self.acc = (self.acc << 1) | int(b)
            self.nbits += 1

    def tobytes(self) -> bytes:
        if self.nbits:
            self.out.append((self.acc << (8 - self.nbits)) & 0xFF)
            self.acc = 0
            self.nbits = 0
        return bytes(self.out)


def _put_offset_bits(w: _BitWriter, offset: int) -> None:
    # little-endian PutBitsNum: low byte first, then bits 11..8
    w.put(offset & 0xFF, 8)
    w.put((offset >> 8) & 0xF, 4)


def _skip_filter(V: np.ndarray, n: int) -> np.ndarray:
    """U[c] — an exact-or-overestimating bound on the C matcher's match
    length at consumed-count ``c`` (for positions with a full 18-byte
    lookahead).  Positions with ``U <= MAX_UNCODED`` are PROVABLY uncoded,
    so the greedy loop emits their literal without any window scan — the
    O(window) FindMatch then runs only at (potentially) coded positions.

    Two components, maxed:

    * far candidates (distance 18..4096) extend contiguously, so a
      3-byte-key repeat within the window flags every position where one
      could reach length 3 (computed over distance 1..4096 — the extra
      near-contiguous hits can only overestimate, which is safe for a
      skip filter);
    * near candidates (distance 1..17) follow the C circular-wrap rule —
      bytes past the window head come from 4096 positions back — computed
      exactly as 17 vectorized leading-AND runs.

    Memory: ~32 bytes per input byte of int64 temporaries.  Payloads here
    are unique chunks/docs (KBs..MBs); above ``_SKIP_FILTER_MAX_BYTES``
    the filter is skipped and every position takes the exact per-token
    scan — unbounded-size inputs stay correct, just slower.

    Only the BOOLEAN "some match reaches 3" matters (the greedy emits a
    literal at <= MAX_UNCODED either way), so the far component needs one
    stable argsort of direct 3-byte keys — not the full 16-level rank
    table build, which dominated tiny payloads.
    """
    N = V.shape[0]
    # far/contiguous: position i has a 3-byte match at distance <= 4096
    # iff its 3-byte key repeats within the window — stable sort makes
    # each key-run position-ascending, so adjacent-in-run distance is the
    # nearest-occurrence distance
    v32 = V.astype(np.int32)
    k3 = (v32[: N - 2] << 16) | (v32[1 : N - 1] << 8) | v32[2:]
    order = np.argsort(k3, kind="stable")
    same = k3[order[1:]] == k3[order[:-1]]
    cur, prev = order[1:][same], order[:-1][same]
    ok = cur - prev <= WINDOW_SIZE
    u1 = np.zeros(N, dtype=np.int64)
    u1[cur[ok]] = 3
    u1 = u1[WINDOW_SIZE:]
    # pad so t+j reads past the end are defined (tail positions use the
    # slow path anyway — their U values are never consulted)
    Vp = np.concatenate([V, np.zeros(MAX_CODED, dtype=np.uint8)])
    u2 = np.zeros(n, dtype=np.int64)
    t0 = WINDOW_SIZE
    for d in range(1, MAX_CODED):
        run = np.ones(n, dtype=bool)
        ln = np.zeros(n, dtype=np.int64)
        for j in range(MAX_CODED):
            if j < d:
                a = Vp[t0 - d + j : t0 - d + j + n]
            else:
                a = Vp[t0 - d + j - WINDOW_SIZE : t0 - d + j - WINDOW_SIZE + n]
            run &= a == Vp[t0 + j : t0 + j + n]
            if not run.any():
                break
            ln += run
        np.maximum(u2, ln, out=u2)
    return np.maximum(u1, u2)


def lzss_encode(data: bytes) -> bytes:
    """Byte stream identical to ``LzssEncodeMemory`` on the same input
    (modulo the uninitialized-memory caveat in the module docstring).

    No circular buffers are simulated: over the virtual stream
    ``V = ' ' * 4096 + data``, the window at consumed-count ``c`` is
    exactly ``V[c : c+4096]`` in scan order (oldest first), the circular
    wrap near the head reads ``V[c + (k+j-4096)]``, the emitted offset is
    ``(c + k) % 4096``, and even the lookahead ring's stale tail slots are
    ``V[4096 + c + j - 18]`` — so the whole encoder state is one integer."""
    n = len(data)
    if n == 0:
        return b""  # lzss.cpp:500-503: empty input emits nothing
    V = np.empty(WINDOW_SIZE + n, dtype=np.uint8)
    V[:WINDOW_SIZE] = _SPACE
    V[WINDOW_SIZE:] = np.frombuffer(data, dtype=np.uint8)
    w = _BitWriter()
    jj = np.arange(MAX_CODED)
    U = _skip_filter(V, n) if n <= _SKIP_FILTER_MAX_BYTES else None
    maybe_coded = None
    if U is not None:
        # fast-path positions (full 18-byte lookahead) that might code;
        # everything between two of these is a pure literal run
        lim = max(0, n - MAX_CODED + 1)
        maybe_coded = np.flatnonzero(U[:lim] > MAX_UNCODED)
    c = 0
    while c < n:
        remaining = n - c
        if remaining >= MAX_CODED:
            if U is not None and U[c] <= MAX_UNCODED:
                # provably literal until the next maybe-coded position —
                # emit the whole run as one vectorized 9-bits-per-byte pack
                at = np.searchsorted(maybe_coded, c)
                e = int(maybe_coded[at]) if at < maybe_coded.size else lim
                run = np.unpackbits(
                    V[WINDOW_SIZE + c : WINDOW_SIZE + e, None], axis=1
                )
                flagged = np.empty((e - c, 9), dtype=np.uint8)
                flagged[:, 0] = 1  # UNCODED flag per literal
                flagged[:, 1:] = run
                w.put_bit_array(flagged.ravel())
                c = e
                continue
            lk = V[WINDOW_SIZE + c : WINDOW_SIZE + c + MAX_CODED]
        else:
            # tail: ring slots past the input hold the bytes consumed
            # 18 positions ago (or deterministic 0 where C reads garbage)
            vidx = WINDOW_SIZE + c + jj
            vidx = np.where(vidx >= WINDOW_SIZE + n, vidx - MAX_CODED, vidx)
            lk = V[vidx].copy()
            lk[vidx < WINDOW_SIZE] = 0
        cand = np.flatnonzero(V[c : c + WINDOW_SIZE] == lk[0])
        best_k, mlen = -1, 0
        if cand.size:
            # first-scan-order length-1 fallback, then collapse the set
            # with one 2nd-byte refinement (most candidates die here),
            # then a one-shot K x 16 compare on the survivors: leading
            # run per row; first argmax == C's first-scan-order winner
            # (and its break at the first length-18 candidate)
            best_k, mlen = int(cand[0]), 1
            idx = cand + 1
            src = c + np.where(idx >= WINDOW_SIZE, idx - WINDOW_SIZE, idx)
            cand = cand[V[src] == lk[1]]
            if cand.size:
                idx = cand[:, None] + jj[None, 2:]
                src = c + np.where(idx >= WINDOW_SIZE, idx - WINDOW_SIZE, idx)
                neq = V[src] != lk[None, 2:]
                lens = 2 + np.where(
                    neq.any(axis=1), neq.argmax(axis=1), MAX_CODED - 2
                )
                at = int(lens.argmax())
                best_k, mlen = int(cand[at]), int(lens[at])
        if mlen > remaining:
            mlen = remaining  # garbage-extended tail match, clamped
        if mlen <= MAX_UNCODED:
            w.put(1, 1)  # UNCODED flag
            w.put(int(V[WINDOW_SIZE + c]), 8)
            c += 1
        else:
            w.put(0, 1)  # ENCODED flag
            _put_offset_bits(w, (c + best_k) % WINDOW_SIZE)
            w.put(mlen - (MAX_UNCODED + 1), LENGTH_BITS)
            c += mlen
    return w.tobytes()


def lzss_decode(data: bytes) -> bytes:
    """Inverse walk (LzssDecodeMemory, lzss.cpp:347-452): tokens until the
    bits run out; zero pad bits parse as ENCODED-then-EOF and are dropped."""
    out = bytearray()
    window = bytearray(b" " * WINDOW_SIZE)
    next_char = 0
    acc = int.from_bytes(data, "big")
    nbits = 8 * len(data)
    while nbits >= 1:
        flag = (acc >> (nbits - 1)) & 1
        nbits -= 1
        if flag == 1:  # uncoded literal
            if nbits < 8:
                break
            c = (acc >> (nbits - 8)) & 0xFF
            nbits -= 8
            out.append(c)
            window[next_char] = c
            next_char = (next_char + 1) % WINDOW_SIZE
        else:  # coded (offset, length)
            if nbits < OFFSET_BITS + LENGTH_BITS:
                break
            low = (acc >> (nbits - 8)) & 0xFF
            high = (acc >> (nbits - 12)) & 0xF
            offset = low | (high << 8)
            length = ((acc >> (nbits - 16)) & 0xF) + MAX_UNCODED + 1
            nbits -= OFFSET_BITS + LENGTH_BITS
            # copy from the PRE-token window (the reference stages the
            # match in a lookahead buffer before writing it back)
            chars = bytes(
                window[(offset + i) % WINDOW_SIZE] for i in range(length)
            )
            out += chars
            for i, ch in enumerate(chars):
                window[(next_char + i) % WINDOW_SIZE] = ch
            next_char = (next_char + length) % WINDOW_SIZE
    return bytes(out)


def lzss_bound(n: int) -> int:
    """Compressed-size bound the reference allocates: n + n/8 + 100
    (src/encoder.cpp:356-358); the true worst case is 9 bits/byte."""
    return n + n // 8 + 100
