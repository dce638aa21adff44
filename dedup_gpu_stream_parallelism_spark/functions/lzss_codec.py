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

Cost model: encode builds one stable trigram argsort, then per coded
token two binary searches enumerate exactly the length-≥3 contenders
(no 4096-byte window scan) and one (K × 15) compare picks the C-scan
winner; inputs above ``_SKIP_FILTER_MAX_BYTES`` fall back to an exact
per-token window scan.  Decode is
O(compressed + output): one ``np.unpackbits`` pass, a per-token boundary
walk over a bytes object (~0.1 µs/token), then vectorized field
extraction, one scatter for all literals, and 1-2 numpy slice copies per
coded token (working memory ~17 B per compressed byte).  Both are called
per unique chunk (~KBs) inside Arrow-batched UDFs — never per row of a
driver loop.
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


def _trigram_index(V: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Shared 3-byte-key index over the virtual stream.

    ``k3[i]`` packs ``V[i..i+2]`` into one int; ``order`` is the STABLE
    argsort of ``k3`` (equal-key runs are position-ascending); ``s``
    composes ``key * N + position`` over that order — strictly increasing,
    so "all positions with key K inside [a, b)" is two vectorized
    searchsorteds.  Feeds both the skip filter (does any key repeat within
    the window?) and the bulk match table (which occurrences, exactly)."""
    N = V.shape[0]
    v32 = V.astype(np.int32)
    k3 = (v32[: N - 2] << 16) | (v32[1 : N - 1] << 8) | v32[2:]
    order = np.argsort(k3, kind="stable")
    s = k3[order].astype(np.int64) * N + order
    return k3, order, s


def _skip_filter(
    V: np.ndarray, n: int, order: np.ndarray, s: np.ndarray
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """U[c] — an exact-or-overestimating bound on the C matcher's match
    length at consumed-count ``c`` (for positions with a full 18-byte
    lookahead).  Positions with ``U <= MAX_UNCODED`` are PROVABLY uncoded,
    so the greedy loop emits their literal without any window scan — the
    match table is then built only at (potentially) coded positions.

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

    Returns ``(U, near1, near2)``: the d=1 and d=2 leading-run lengths are
    EXACT per-position match lengths at window slots 4095/4094 (the two
    slots whose first three compare bytes wrap, invisible to the trigram
    index) — the match table consumes them as the near-candidate arm.
    """
    N = V.shape[0]
    # far/contiguous: position i has a 3-byte match at distance <= 4096
    # iff its 3-byte key repeats within the window — the stable sort makes
    # each key-run position-ascending, so adjacent-in-run distance is the
    # nearest-occurrence distance (same-key iff s diff == position diff)
    same = (s[1:] - s[:-1]) == (order[1:] - order[:-1])
    cur, prev = order[1:][same], order[:-1][same]
    ok = cur - prev <= WINDOW_SIZE
    u1 = np.zeros(N, dtype=np.int64)
    u1[cur[ok]] = 3
    u1 = u1[WINDOW_SIZE:]
    # pad so t+j reads past the end are defined (tail positions use the
    # slow path anyway — their U values are never consulted)
    Vp = np.concatenate([V, np.zeros(MAX_CODED, dtype=np.uint8)])
    u2 = np.zeros(n, dtype=np.int64)
    near1 = near2 = np.zeros(0, dtype=np.int64)
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
        if d == 1:
            near1 = ln.copy()
        elif d == 2:
            near2 = ln.copy()
        np.maximum(u2, ln, out=u2)
    return np.maximum(u1, u2), near1, near2


def _find_match(V: np.ndarray, c: int, lk: np.ndarray, jj: np.ndarray) -> tuple[int, int]:
    """C FindMatch at one position: first-scan-order length-1 fallback,
    one 2nd-byte refinement (most candidates die there), then a one-shot
    K x 16 compare on the survivors — leading run per row; first argmax
    == the C scan's winner (oldest wins ties, stop at the first
    length-18 candidate)."""
    cand = np.flatnonzero(V[c : c + WINDOW_SIZE] == lk[0])
    if not cand.size:
        return -1, 0
    best_k, mlen = int(cand[0]), 1
    idx = cand + 1
    src = c + np.where(idx >= WINDOW_SIZE, idx - WINDOW_SIZE, idx)
    cand = cand[V[src] == lk[1]]
    if cand.size:
        idx = cand[:, None] + jj[None, 2:]
        src = c + np.where(idx >= WINDOW_SIZE, idx - WINDOW_SIZE, idx)
        neq = V[src] != lk[None, 2:]
        lens = 2 + np.where(neq.any(axis=1), neq.argmax(axis=1), MAX_CODED - 2)
        at = int(lens.argmax())
        best_k, mlen = int(cand[at]), int(lens[at])
    return best_k, mlen


def _fast_match(
    V: np.ndarray,
    SW: np.ndarray,
    c: int,
    lo: int,
    hi: int,
    order: np.ndarray,
    near1: np.ndarray,
    near2: np.ndarray,
    jj3: np.ndarray,
) -> tuple[int, int]:
    """C FindMatch at a full-lookahead position via the trigram index.

    Any length->=3 far candidate (window slots 0..4093) matches its first
    three bytes contiguously, so the precomputed ``s``-range ``[lo, hi)``
    enumerates exactly the contenders — no 4096-byte window scan, no
    byte-0/byte-1 refinement over every 'e'-starts-here position.  One
    (K x 15) compare of bytes 3..17 picks the C scan's winner: first
    argmax == oldest-wins-ties and stop-at-the-first-length-18.  ``SW`` is
    the zero-copy sliding window over ``V`` offset by the proven trigram
    (``SW[q] == V[q+3 : q+18]``), so the usual no-wrap case is one
    fancy-gather of candidate rows; only
    candidates within 17 bytes of the window head read circularly (bytes
    past the head come from 4096 back) and take the index-arithmetic
    path.  Slots 4094/4095 wrap inside the first three bytes — their
    exact lengths come precomputed from the skip filter and merge last,
    replacing only on strictly-greater (the C scan reaches them after
    every far slot, 4094 before 4095).  Shorter-than-3 outcomes return
    length 0: the greedy emits a literal for anything <= MAX_UNCODED
    either way."""
    best_k, mlen = -1, 0
    lkb = c + WINDOW_SIZE
    if hi > lo:
        qs = order[lo:hi]
        if int(qs[-1]) < lkb - (MAX_CODED - 1):
            # no candidate's 18-byte extension can reach the window head
            neq = SW[qs] != SW[lkb]
        else:
            idx = qs[:, None] + jj3[None, :]
            src = np.where(idx >= lkb, idx - WINDOW_SIZE, idx)
            neq = V[src] != V[lkb + MAX_UNCODED + 1 : lkb + MAX_CODED]
        first_bad = neq.argmax(axis=1)
        lens = (MAX_UNCODED + 1) + first_bad
        # argmax is 0 both for a mismatch AT byte 3 and for NO mismatch —
        # disambiguate by the first column (cheaper than an any() reduce)
        lens[(first_bad == 0) & ~neq[:, 0]] = MAX_CODED
        at = int(lens.argmax())
        best_k, mlen = int(qs[at]) - c, int(lens[at])
    n2 = int(near2[c])
    if n2 > mlen:
        best_k, mlen = WINDOW_SIZE - 2, n2
    n1 = int(near1[c])
    if n1 > mlen:
        best_k, mlen = WINDOW_SIZE - 1, n1
    return best_k, mlen


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
    if n > _SKIP_FILTER_MAX_BYTES:
        return _encode_scan(V, n, w, jj)
    k3, order, s = _trigram_index(V)
    U, near1, near2 = _skip_filter(V, n, order, s)
    # fast-path positions (full 18-byte lookahead) that might code;
    # everything between two of these is a pure literal run
    lim = max(0, n - MAX_CODED + 1)
    maybe_coded = np.flatnonzero(U[:lim] > MAX_UNCODED)
    N = V.shape[0]
    jj3 = np.arange(MAX_UNCODED + 1, MAX_CODED)
    # SW[q] = V[q+3 : q+18] — candidate rows beyond the proven trigram
    SW = np.lib.stride_tricks.sliding_window_view(
        V[MAX_UNCODED + 1 :], MAX_CODED - MAX_UNCODED - 1
    )
    # candidate s-ranges for every maybe-coded position in two bulk
    # searchsorteds (vs two binary-search CALLS per emitted token)
    lo_d = np.zeros(lim, dtype=np.int64)
    hi_d = np.zeros(lim, dtype=np.int64)
    if maybe_coded.size:
        base = k3[WINDOW_SIZE + maybe_coded].astype(np.int64) * N
        lo_d[maybe_coded] = np.searchsorted(s, base + maybe_coded)
        hi_d[maybe_coded] = np.searchsorted(
            s, base + maybe_coded + WINDOW_SIZE - 2
        )
    c = 0
    put = w.put
    while c < n:
        if n - c >= MAX_CODED:
            if U[c] <= MAX_UNCODED:
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
            best_k, mlen = _fast_match(
                V, SW, c, int(lo_d[c]), int(hi_d[c]), order, near1, near2, jj3
            )
            # remaining >= MAX_CODED >= mlen: the tail clamp can't trigger
            if mlen <= MAX_UNCODED:
                put(0x100 | int(V[WINDOW_SIZE + c]), 9)  # UNCODED flag + byte
                c += 1
            else:
                # ENCODED flag 0 + LE offset (low 8, high 4) + length nibble
                offset = (c + best_k) % WINDOW_SIZE
                put(
                    ((offset & 0xFF) << 8)
                    | ((offset >> 8) << 4)
                    | (mlen - (MAX_UNCODED + 1)),
                    1 + OFFSET_BITS + LENGTH_BITS,
                )
                c += mlen
        else:
            c = _encode_tail_token(V, n, c, w, jj)
    return w.tobytes()


def _encode_tail_token(
    V: np.ndarray, n: int, c: int, w: _BitWriter, jj: np.ndarray
) -> int:
    """One token at a tail position (fewer than 18 bytes of lookahead):
    ring slots past the input hold the bytes consumed 18 positions ago
    (or deterministic 0 where C reads garbage); the selected match is
    clamped to the remaining input after selection (lzss.cpp:515)."""
    vidx = WINDOW_SIZE + c + jj
    vidx = np.where(vidx >= WINDOW_SIZE + n, vidx - MAX_CODED, vidx)
    lk = V[vidx].copy()
    lk[vidx < WINDOW_SIZE] = 0
    best_k, mlen = _find_match(V, c, lk, jj)
    if mlen > n - c:
        mlen = n - c  # garbage-extended tail match, clamped
    if mlen <= MAX_UNCODED:
        w.put(1, 1)  # UNCODED flag
        w.put(int(V[WINDOW_SIZE + c]), 8)
        return c + 1
    w.put(0, 1)  # ENCODED flag
    _put_offset_bits(w, (c + best_k) % WINDOW_SIZE)
    w.put(mlen - (MAX_UNCODED + 1), LENGTH_BITS)
    return c + mlen


def _encode_scan(V: np.ndarray, n: int, w: _BitWriter, jj: np.ndarray) -> bytes:
    """Per-token fallback for inputs too large for the trigram index's
    O(n) int64 temporaries: every position takes the exact window scan.
    Unbounded-size inputs stay correct, just slower."""
    c = 0
    while c < n:
        if n - c >= MAX_CODED:
            lk = V[WINDOW_SIZE + c : WINDOW_SIZE + c + MAX_CODED]
            best_k, mlen = _find_match(V, c, lk, jj)
            if mlen <= MAX_UNCODED:
                w.put(1, 1)
                w.put(int(V[WINDOW_SIZE + c]), 8)
                c += 1
            else:
                w.put(0, 1)
                _put_offset_bits(w, (c + best_k) % WINDOW_SIZE)
                w.put(mlen - (MAX_UNCODED + 1), LENGTH_BITS)
                c += mlen
        else:
            c = _encode_tail_token(V, n, c, w, jj)
    return w.tobytes()


def lzss_decode(data: bytes) -> bytes:
    """Inverse walk (LzssDecodeMemory, lzss.cpp:347-452): tokens until the
    bits run out; zero pad bits parse as ENCODED-then-EOF and are dropped.

    Vectorized two-pass decode.  No circular window is simulated: over the
    virtual stream ``V = ' ' * 4096 + output``, the decoder window at
    output-count ``c`` is exactly ``V[c : c+4096]``, so circular slot ``s``
    holds ``V[c + ((s - c) mod 4096)]`` — and because the reference stages
    a match in its lookahead buffer before writing it back, a coded token's
    source lies entirely in the PRE-token window, i.e. strictly before its
    destination in ``V``.  Every copy is therefore 1-2 contiguous slices
    (one when the circular read doesn't wrap, two when it does).

    Pass 1 walks token boundaries (the only data-dependent part) over a
    bytes object; everything else — field extraction via a sliding-byte
    table, output offsets via cumsum, all literals via one scatter — is
    numpy.  O(compressed + output) time, ~17 B of temporaries per
    compressed byte."""
    if not data:
        return b""
    bits = np.unpackbits(np.frombuffer(data, dtype=np.uint8))
    nbits = bits.size
    # byte_at[q] = bits[q..q+7] as an MSB-first byte (zero-padded past EOF);
    # a 4-bit field at q is then byte_at[q] >> 4
    bp = np.concatenate([bits, np.zeros(8, dtype=np.uint8)])
    byte_at = np.zeros(nbits, dtype=np.uint8)
    for i in range(8):
        byte_at += bp[i : i + nbits] << np.uint8(7 - i)
    # pass 1: token starts.  Literal = 9 bits, coded = 17; a token whose
    # bits run out mid-stream is discarded (pad-bit semantics above).
    flags = bits.tobytes()
    lit_starts: list[int] = []
    cod_starts: list[int] = []
    lit_append, cod_append = lit_starts.append, cod_starts.append
    lit_max, cod_max = nbits - 9, nbits - 17
    p = 0
    while True:
        if p <= lit_max and flags[p]:
            lit_append(p)
            p += 9
        elif p <= cod_max and not flags[p]:
            cod_append(p)
            p += 17
        else:
            break
    nl, nc = len(lit_starts), len(cod_starts)
    P_l = np.asarray(lit_starts, dtype=np.int64)
    P_c = np.asarray(cod_starts, dtype=np.int64)
    # little-endian GetBitsNum field order: low offset byte, then bits 11..8
    off = byte_at[P_c + 1].astype(np.int64) | (
        (byte_at[P_c + 9] >> 4).astype(np.int64) << 8
    )
    ln = (byte_at[P_c + 13] >> 4).astype(np.int64) + (MAX_UNCODED + 1)
    # output offset of every token = exclusive cumsum in stream order
    sizes = np.concatenate([np.ones(nl, dtype=np.int64), ln])
    order = np.argsort(np.concatenate([P_l, P_c]), kind="stable")
    csum = np.cumsum(sizes[order])
    total = int(csum[-1]) if csum.size else 0
    starts = np.empty(nl + nc, dtype=np.int64)
    starts[order] = csum - sizes[order]
    V = np.empty(WINDOW_SIZE + total, dtype=np.uint8)
    V[:WINDOW_SIZE] = _SPACE
    if nl:
        V[WINDOW_SIZE + starts[:nl]] = byte_at[P_l + 1]
    cod_out = starts[nl:].tolist()
    off_l, ln_l = off.tolist(), ln.tolist()
    for i in range(nc):
        c, o, length = cod_out[i], off_l[i], ln_l[i]
        r0 = (o - c) % WINDOW_SIZE
        first = WINDOW_SIZE - r0
        d = WINDOW_SIZE + c
        if length <= first:
            V[d : d + length] = V[c + r0 : c + r0 + length]
        else:
            V[d : d + first] = V[c + r0 : c + WINDOW_SIZE]
            V[d + first : d + length] = V[c : c + length - first]
    return V[WINDOW_SIZE:].tobytes()


def lzss_bound(n: int) -> int:
    """Compressed-size bound the reference allocates: n + n/8 + 100
    (src/encoder.cpp:356-358); the true worst case is 9 bits/byte."""
    return n + n // 8 + 100
