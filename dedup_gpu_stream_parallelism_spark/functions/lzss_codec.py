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

Cost model: the C scan's winner is "the LEFTMOST occurrence of the
LONGEST matching prefix" (oldest wins length ties, first length-18 stops
the scan), so the greedy walk finds it with ``bytes.find`` — C-speed
memmem over the virtual stream, restarting from the previous hit with a
one-byte-longer prefix — for every candidate whose 18-byte extension
stays left of the window head.  The head-crossing candidates (distance
≤ 17, where the C matcher wraps 4096 back) come precomputed from the
skip filter's near-candidate matrix and merge by the scan's slot order.
No per-token numpy calls remain; a trigram argsort feeds only the
literal skip filter, and the whole token stream is packed in one
vectorized pass.  Inputs above ``_SKIP_FILTER_MAX_BYTES`` fall back to
an exact per-token window scan.  Decode is
O(compressed + output): one ``np.unpackbits`` pass, a RUN-level boundary
walk (strided ``bytes`` find over maximal literal/coded runs), then
vectorized field extraction, one scatter for all literals, and 1-2
bytearray slice copies per coded token (working memory ~17 B per
compressed byte).  Both are called
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
# above this, the encode skip-filter's O(n) temporaries (~36 B per input
# byte: 17-row int8 near matrix + int64 trigram index ⇒ ~2.3 GiB per task
# at the cap) would rival executor memory — fall back to per-token scans
_SKIP_FILTER_MAX_BYTES = 64 << 20
# literal runs at least this long are emitted as one contiguous
# unpackbits block; shorter ones go through the column scatter
_LONG_LIT_RUN = 32


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


def _trigram_index(V: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """3-byte-key index over the virtual stream, for the skip filter.

    ``k3[i]`` packs ``V[i..i+2]`` into one int; ``order`` is the STABLE
    argsort of ``k3`` (equal-key runs are position-ascending); ``s``
    composes ``key * N + position`` over that order — strictly increasing,
    so same-key adjacency (does any key repeat within the window?) is one
    vectorized diff over ``(s, order)``."""
    N = V.shape[0]
    v32 = V.astype(np.int32)
    k3 = (v32[: N - 2] << 16) | (v32[1 : N - 1] << 8) | v32[2:]
    order = np.argsort(k3, kind="stable")
    s = k3[order].astype(np.int64) * N + order
    return order, s


def _skip_filter(
    V: np.ndarray, n: int, order: np.ndarray, s: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
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
      bytes past the window head come from 4096 positions back — a dense
      3-byte check per distance, then sparse gathered extension only at
      the hits (real text: ~4% of positions have any near candidate).

    Memory: ~36 bytes per input byte at peak (the 17-row int8 ``near``
    matrix plus the trigram index's int64 ``s``/``order``).  Payloads here are unique
    chunks/docs (KBs..MBs); above ``_SKIP_FILTER_MAX_BYTES`` the filter
    is skipped and every position takes the exact per-token scan —
    unbounded-size inputs stay correct, just slower.

    Returns ``(U, near)``: ``U`` is 3 where a candidate could reach coded
    length, 0 elsewhere (the walk only ever tests ``> MAX_UNCODED``).
    ``near[d, c]`` (d = 1..17) is the EXACT C-semantics match length at
    window slot ``4096 - d`` — the leading equal run with the
    circular-wrap rule applied from byte ``d`` on — wherever that length
    reaches 3 (shorter lengths lose every merge: the walk emits a literal
    at ``m <= MAX_UNCODED`` regardless of slot, so they are left 0).
    These are the candidates whose 18-byte extension can cross the window
    head, which the ``bytes.find`` far arm cannot see — the walk merges
    them by scan-slot order.
    """
    N = V.shape[0]
    # far/contiguous: position i has a 3-byte match at distance <= 4096
    # iff its 3-byte key repeats within the window — the stable sort makes
    # each key-run position-ascending, so adjacent-in-run distance is the
    # nearest-occurrence distance (same-key iff s diff == position diff)
    same = (s[1:] - s[:-1]) == (order[1:] - order[:-1])
    cur, prev = order[1:][same], order[:-1][same]
    ok = cur - prev <= WINDOW_SIZE
    u1 = np.zeros(N, dtype=np.int8)
    u1[cur[ok]] = 3
    u1 = u1[WINDOW_SIZE:]
    # pad so t+j reads past the end are defined (tail positions use the
    # slow path anyway — their U values are never consulted)
    Vp = np.concatenate([V, np.zeros(MAX_CODED, dtype=np.uint8)])
    near = np.zeros((MAX_CODED, n), dtype=np.int8)  # lengths <= 18 fit int8
    eq = np.empty(n, dtype=bool)
    t0 = WINDOW_SIZE
    for d in range(1, MAX_CODED):
        # dense: does the 3-byte prefix match at distance d?  (3 passes
        # over n instead of up to 18 — lengths below 3 lose every merge)
        run3 = np.ones(n, dtype=bool)
        for j in range(MAX_UNCODED + 1):
            if j < d:
                a = Vp[t0 - d + j : t0 - d + j + n]
            else:
                a = Vp[t0 - d + j - WINDOW_SIZE : t0 - d + j - WINDOW_SIZE + n]
            np.equal(a, Vp[t0 + j : t0 + j + n], out=eq)
            run3 &= eq
            if not run3.any():
                break
        else:
            ln = near[d]
            if int(run3.sum()) > (n >> 3):
                # dense hits (self-similar payloads): contiguous slice
                # compares beat gathered ones ~10x per element
                u1 |= 3 * run3.astype(np.int8)
                ln += 3 * run3.astype(np.int8)
                run = run3
                for j in range(MAX_UNCODED + 1, MAX_CODED):
                    off = t0 - d + j if j < d else t0 - d + j - WINDOW_SIZE
                    np.equal(Vp[off : off + n], Vp[t0 + j : t0 + j + n], out=eq)
                    run = run & eq
                    if not run.any():
                        break
                    ln += run
            else:
                # sparse hits (real text: ~4% of positions have any near
                # candidate): exact wrapped lengths via shrinking gathers
                alive = np.flatnonzero(run3)
                ln[alive] = MAX_UNCODED + 1
                u1[alive] = 3
                for j in range(MAX_UNCODED + 1, MAX_CODED):
                    off = t0 - d + j if j < d else t0 - d + j - WINDOW_SIZE
                    alive = alive[Vp[alive + off] == Vp[alive + t0 + j]]
                    if alive.size == 0:
                        break
                    ln[alive] += 1
    return u1, near


def _near_best(
    near: np.ndarray, maybe: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """Winner among the head-crossing candidates, at the maybe-coded
    positions only (the walk consults nobody else): the C scan visits
    slot ``4096 - d`` for d = 17..1 in ascending-slot order and replaces
    on strictly greater, so the largest d wins length ties — iterate d
    descending with a strict-``>`` mask."""
    sub = near[:, maybe]
    nb_len = np.zeros(maybe.size, dtype=np.int64)
    nb_slot = np.zeros(maybe.size, dtype=np.int64)
    for d in range(MAX_CODED - 1, 0, -1):
        ln = sub[d]
        u = ln > nb_len
        nb_len[u] = ln[u]
        nb_slot[u] = WINDOW_SIZE - d
    return nb_len, nb_slot


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


def _emit_tokens(
    V: np.ndarray,
    lit_ranges: list[tuple[int, int]],
    cod_c: list[int],
    cod_off: list[int],
    cod_len: list[int],
) -> bytes:
    """Pack the whole token stream in one vectorized pass.

    Bit offsets need no sort: a token's start is ``9·(literal bytes
    before it) + 17·(coded tokens before it)``, two searchsorteds over
    the already-ascending position lists.  Long literal runs write one
    contiguous ``np.unpackbits`` block each; short runs and coded tokens
    scatter column-wise (9/16 one-dimensional uint8 scatters — the coded
    flag bit is 0 and the bits array starts zeroed).  ``np.packbits``
    zero-pads the final byte (BitMemoryToArray semantics)."""
    rs = np.asarray(lit_ranges, dtype=np.int64).reshape(-1, 2)
    r0, rl = rs[:, 0], rs[:, 1] - rs[:, 0]
    litB = np.concatenate([[0], np.cumsum(rl)])  # literal bytes before range i
    vc = np.asarray(cod_c, dtype=np.int64)
    # ranges and coded positions are disjoint and each list is ascending
    start_r = 9 * litB[:-1] + 17 * np.searchsorted(vc, r0)
    start_c = 9 * litB[np.searchsorted(r0, vc)] + 17 * np.arange(vc.size)
    bits = np.zeros(9 * int(litB[-1]) + 17 * vc.size, dtype=np.uint8)
    long_m = rl >= _LONG_LIT_RUN
    for s0, a, b in zip(
        start_r[long_m].tolist(), r0[long_m].tolist(), rs[long_m, 1].tolist()
    ):
        block = np.empty((b - a, 9), dtype=np.uint8)
        block[:, 0] = 1  # UNCODED flag per literal
        block[:, 1:] = np.unpackbits(
            V[WINDOW_SIZE + a : WINDOW_SIZE + b, None], axis=1
        )
        bits[s0 : s0 + 9 * (b - a)] = block.ravel()
    sm = ~long_m
    if sm.any():
        srl = rl[sm]
        within = np.arange(int(srl.sum())) - np.repeat(
            np.cumsum(srl) - srl, srl
        )
        bpos = np.repeat(r0[sm], srl) + within
        bstart = np.repeat(start_r[sm], srl) + 9 * within
        vv = V[WINDOW_SIZE + bpos]
        bits[bstart] = 1  # UNCODED flag
        for i in range(8):
            bits[bstart + 1 + i] = (vv >> (7 - i)) & 1
    if vc.size:
        off = np.asarray(cod_off, dtype=np.int64)
        ln = np.asarray(cod_len, dtype=np.int64)
        # ENCODED flag 0 (stays zeroed) + LE offset (low 8, high 4) + nibble
        val = ((off & 0xFF) << 8) | ((off >> 8) << 4) | (ln - (MAX_UNCODED + 1))
        for i in range(16):
            bits[start_c + 1 + i] = ((val >> (15 - i)) & 1).astype(np.uint8)
    return np.packbits(bits).tobytes()


def lzss_encode(data: bytes) -> bytes:
    """Byte stream identical to ``LzssEncodeMemory`` on the same input
    (modulo the uninitialized-memory caveat in the module docstring).

    No circular buffers are simulated: over the virtual stream
    ``V = ' ' * 4096 + data``, the window at consumed-count ``c`` is
    exactly ``V[c : c+4096]`` in scan order (oldest first), the circular
    wrap near the head reads ``V[c + (k+j-4096)]``, the emitted offset is
    ``(c + k) % 4096``, and even the lookahead ring's stale tail slots are
    ``V[4096 + c + j - 18]`` — so the whole encoder state is one integer.

    Three phases: (1) vectorized skip filter (which positions can code at
    all, plus exact lengths for the head-crossing candidates), (2) the
    greedy walk — pure python driven by ``bytes.find``: the C scan's
    winner is the leftmost occurrence of the longest matching prefix, and
    constraining ``find`` to end at the current position makes straight
    extension exactly the C circular read for every candidate it can
    return, (3) one vectorized pack of the whole token stream."""
    n = len(data)
    if n == 0:
        return b""  # lzss.cpp:500-503: empty input emits nothing
    V = np.empty(WINDOW_SIZE + n, dtype=np.uint8)
    V[:WINDOW_SIZE] = _SPACE
    V[WINDOW_SIZE:] = np.frombuffer(data, dtype=np.uint8)
    jj = np.arange(MAX_CODED)
    if n > _SKIP_FILTER_MAX_BYTES:
        return _encode_scan(V, n, _BitWriter(), jj)
    order, s = _trigram_index(V)
    U, near = _skip_filter(V, n, order, s)
    # fast-path positions (full 18-byte lookahead) that might code;
    # everything between two of these is a pure literal run
    lim = max(0, n - MAX_CODED + 1)
    maybe = np.flatnonzero(U[:lim] > MAX_UNCODED)
    M = maybe.size
    nb_len, nb_slot = _near_best(near, maybe)  # aligned to maybe index
    maybe_l = maybe.tolist()
    nb_len_l = nb_len.tolist()
    nb_slot_l = nb_slot.tolist()
    Vb = V.tobytes()
    find = Vb.find
    lit_ranges: list[tuple[int, int]] = []
    cod_c: list[int] = []
    cod_off: list[int] = []
    cod_len: list[int] = []
    lit_app = lit_ranges.append
    cc_app, co_app, cl_app = cod_c.append, cod_off.append, cod_len.append
    c = 0
    ptr = 0
    while c < lim:
        while ptr < M and maybe_l[ptr] < c:
            ptr += 1
        if ptr >= M:
            lit_ranges.append((c, lim))
            c = lim
            break
        p = maybe_l[ptr]
        if p > c:
            lit_ranges.append((c, p))  # provably-literal run
            c = p
            continue
        # far arm: candidates whose match stays left of the window head.
        # find(sub[:L], c, P) returns the oldest occurrence q with
        # q + L <= P (straight bytes == C's circular read there) and
        # q <= P - L <= c + 4093 (inside the scannable window) — growing
        # L from each hit yields the leftmost-longest = the C winner
        P = c + WINDOW_SIZE
        sub = Vb[P : P + MAX_CODED]
        Lf, qf = 0, -1
        q = find(sub[: MAX_UNCODED + 1], c, P)
        if q >= 0:
            L = MAX_UNCODED + 1
            while True:
                cap = P - q
                if cap > MAX_CODED:
                    cap = MAX_CODED
                while L < cap and Vb[q + L] == sub[L]:
                    L += 1
                Lf, qf = L, q
                if L >= MAX_CODED:
                    break
                q = find(sub[: L + 1], q + 1, P)
                if q < 0:
                    break
                L += 1
        # near arm (head-crossing candidates): longer wins; on a length
        # tie the C scan keeps the earlier (smaller) window slot
        m, slot = Lf, qf - c
        ln = nb_len_l[ptr]
        if ln > m or (ln == m and nb_slot_l[ptr] < slot):
            m, slot = ln, nb_slot_l[ptr]
        # remaining >= MAX_CODED >= m: the tail clamp can't trigger
        if m <= MAX_UNCODED:
            lit_app((c, c + 1))
            c += 1
        else:
            cc_app(c)
            co_app((c + slot) % WINDOW_SIZE)
            cl_app(m)
            c += m
    while c < n:  # tail: fewer than 18 bytes of lookahead
        bk, m = _tail_fields(V, n, c, jj)
        if m <= MAX_UNCODED:
            lit_ranges.append((c, c + 1))
            c += 1
        else:
            cod_c.append(c)
            cod_off.append((c + bk) % WINDOW_SIZE)
            cod_len.append(m)
            c += m
    return _emit_tokens(V, lit_ranges, cod_c, cod_off, cod_len)


def _tail_fields(
    V: np.ndarray, n: int, c: int, jj: np.ndarray
) -> tuple[int, int]:
    """Match fields at a tail position (fewer than 18 bytes of lookahead):
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
    return best_k, mlen


def _encode_tail_token(
    V: np.ndarray, n: int, c: int, w: _BitWriter, jj: np.ndarray
) -> int:
    """One tail token through the bit writer (the ``_encode_scan``
    fallback's emitter)."""
    best_k, mlen = _tail_fields(V, n, c, jj)
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


# how many same-kind tokens each strided probe in lzss_decode's pass 1
# inspects at once; bounds the per-probe slice copy while keeping the
# boundary walk at run (not token) granularity
_RUN_PROBE = 4096


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

    Pass 1 walks token boundaries at RUN granularity: the stream is an
    alternation of maximal literal runs (9-bit stride) and coded runs
    (17-bit stride), so each run resolves with C-speed strided ``bytes``
    slices + ``find`` instead of a per-token Python step — and because the
    runs come out in stream order, token output offsets follow from one
    cumsum with no sort.  Fields extract on demand via two gathers from a
    16-bit byte window (only token positions, never every bit), all
    literals land in one scatter, and coded copies run as bytearray slice
    assignments (C memcpy per token).  O(compressed + output) time, ~17 B
    of temporaries per compressed byte."""
    if not data:
        return b""
    dbytes = np.frombuffer(data, dtype=np.uint8)
    bits = np.unpackbits(dbytes)
    nbits = bits.size
    # field_at(q) = bits[q..q+7] as an MSB-first byte, extracted on demand
    # from a 16-bit window over the source bytes — two gathers at the
    # positions that need a field, instead of a full sliding-byte table
    # over every bit position (token fields touch < 1/9 of them)
    dpad = np.concatenate([dbytes, np.zeros(2, dtype=np.uint8)])

    def field_at(q: np.ndarray) -> np.ndarray:
        byt = q >> 3
        w = (dpad[byt].astype(np.int64) << 8) | dpad[byt + 1]
        return (w >> (8 - (q & 7))) & 0xFF
    # pass 1: maximal same-kind runs.  Literal = 9 bits, coded = 17; a
    # token whose bits run out mid-stream is discarded (pad-bit semantics
    # above), which is exactly the `p <= limit` bound on each run.
    flags = bits.tobytes()
    lit_max, cod_max = nbits - 9, nbits - 17
    run_is_lit: list[bool] = []
    run_start: list[int] = []
    run_count: list[int] = []
    p = 0
    while True:
        if p <= lit_max and flags[p]:
            stride, stop_byte, limit = 9, 0, lit_max
        elif p <= cod_max and not flags[p]:
            stride, stop_byte, limit = 17, 1, cod_max
        else:
            break
        start = p
        k = 0
        while p <= limit:
            chunk = flags[p : min(limit + 1, p + stride * _RUN_PROBE) : stride]
            j = chunk.find(stop_byte)
            if j >= 0:
                k += j
                p += stride * j
                break
            k += len(chunk)
            p += stride * len(chunk)
        run_is_lit.append(stride == 9)
        run_start.append(start)
        run_count.append(k)
    counts_r = np.asarray(run_count, dtype=np.int64)
    n_tok = int(counts_r.sum()) if counts_r.size else 0
    if n_tok == 0:
        return b""
    starts_r = np.asarray(run_start, dtype=np.int64)
    # expand runs to per-token bit positions, already in stream order
    is_lit = np.repeat(np.asarray(run_is_lit, dtype=bool), counts_r)
    first_tok = np.concatenate(
        [np.zeros(1, dtype=np.int64), np.cumsum(counts_r)[:-1]]
    )
    within = np.arange(n_tok, dtype=np.int64) - np.repeat(first_tok, counts_r)
    P = np.repeat(starts_r, counts_r) + np.where(is_lit, 9, 17) * within
    P_l = P[is_lit]
    P_c = P[~is_lit]
    # little-endian GetBitsNum field order: low offset byte, then bits 11..8
    off = field_at(P_c + 1) | ((field_at(P_c + 9) >> 4) << 8)
    ln = (field_at(P_c + 13) >> 4) + (MAX_UNCODED + 1)
    # output offset of every token = exclusive cumsum in stream order
    sizes = np.ones(n_tok, dtype=np.int64)
    sizes[~is_lit] = ln
    csum = np.cumsum(sizes)
    total = int(csum[-1])
    out_start = csum - sizes
    # bytearray output so pass 2's tiny per-token copies are C-level slice
    # assignments; numpy scatters through a writable frombuffer view
    buf = bytearray(WINDOW_SIZE + total)
    V = np.frombuffer(buf, dtype=np.uint8)
    V[:WINDOW_SIZE] = _SPACE
    if P_l.size:
        V[WINDOW_SIZE + out_start[is_lit]] = field_at(P_l + 1)
    cod_out = out_start[~is_lit].tolist()
    off_l, ln_l = off.tolist(), ln.tolist()
    W = WINDOW_SIZE
    for i in range(len(cod_out)):
        c, o, length = cod_out[i], off_l[i], ln_l[i]
        r0 = (o - c) % W
        first = W - r0
        d = W + c
        if length <= first:
            buf[d : d + length] = buf[c + r0 : c + r0 + length]
        else:
            buf[d : d + first] = buf[c + r0 : c + W]
            buf[d + first : d + length] = buf[c : c + length - first]
    return bytes(memoryview(buf)[W:])


def lzss_bound(n: int) -> int:
    """Compressed-size bound the reference allocates: n + n/8 + 100
    (src/encoder.cpp:356-358); the true worst case is 9 bits/byte."""
    return n + n // 8 + 100
