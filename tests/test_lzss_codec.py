"""LZSS bit-stream codec: golden bytes, round-trip properties, and —
when a C++ toolchain plus the reference sources are present — fuzzed
bit-exactness against a build of the reference's own LzssEncodeMemory /
LzssDecodeMemory (libs/lzsslib/src/lzss.cpp:454-595 / :347-452)."""

from __future__ import annotations

import os
import random
import shutil
import subprocess

import pytest

from dedup_gpu_stream_parallelism_spark.functions.lzss_codec import (
    MAX_CODED,
    MAX_UNCODED,
    WINDOW_SIZE,
    lzss_bound,
    lzss_decode,
    lzss_encode,
)

REF_LZSS_SRC = "/root/reference/libs/lzsslib/src"


def test_constants_match_reference_spec():
    # lzlocal.h:47-59
    assert WINDOW_SIZE == 4096
    assert MAX_UNCODED == 2
    assert MAX_CODED == 18


def test_golden_bit_stream():
    """Hand-computed token stream for b"aaaaaaa": three uncoded 'a'
    (window is spaces), one coded (offset 0, length 3 → stored 0), one
    uncoded 'a', zero-padded to the byte — 53 bits → 7 bytes."""
    assert lzss_encode(b"aaaaaaa") == bytes.fromhex("b0d86c20000b08")
    assert lzss_decode(bytes.fromhex("b0d86c20000b08")) == b"aaaaaaa"


def test_empty_input():
    assert lzss_encode(b"") == b""
    assert lzss_decode(b"") == b""


def test_space_prefill_matches():
    """Leading spaces match the pre-filled window: a run of >=3 spaces at
    the very start must emit a coded token, not literals."""
    data = b"          x"  # 10 spaces
    enc = lzss_encode(data)
    assert lzss_decode(enc) == data
    # 10 spaces as one coded token (17 bits) + 'x' literal (9) = 26 bits
    assert len(enc) == (17 + 9 + 7) // 8


def test_roundtrip_properties():
    rng = random.Random(1234)
    cases = [
        b"x",
        b"ab",
        b"abcabcabcabc" * 20,
        bytes(range(256)) * 2,
        (b"def f(x):\n    return x + 1\n\n" * 200),
        rng.randbytes(10_000),
        bytes(rng.choice(b"ab ") for _ in range(6000)),
        b"z" * 10_000,  # RLE-ish: max-length coded tokens
    ]
    for data in cases:
        enc = lzss_encode(data)
        assert lzss_decode(enc) == data
        assert len(enc) <= lzss_bound(len(data))


def test_worst_case_is_nine_eighths():
    """Incompressible input costs exactly 9 bits/byte (flag + literal)."""
    data = bytes(range(250))  # no repeats, nothing matches the window
    enc = lzss_encode(data)
    assert len(enc) == (9 * len(data) + 7) // 8


def test_pad_bits_do_not_emit():
    """Up to 7 zero pad bits parse as an ENCODED flag that hits EOF —
    decode must drop them, for every pad width."""
    for n in range(1, 9):
        data = bytes(range(65, 65 + n))
        assert lzss_decode(lzss_encode(data)) == data


def _build_reference_oracle() -> str | None:
    """Compile the reference's LZSS into a stdin→stdout harness (cached);
    None when the toolchain or sources are unavailable."""
    exe = "/tmp/lzss_oracle_pytest/lzss_ref"
    if os.path.exists(exe):
        return exe
    if not shutil.which("g++") or not os.path.isdir(REF_LZSS_SRC):
        return None
    d = "/tmp/lzss_oracle_pytest"
    os.makedirs(os.path.join(d, "CL"), exist_ok=True)
    # minimal GPU-header stubs so the CPU paths compile host-only
    stubs = {
        "CL/cl.hpp": (
            "#pragma once\ntypedef int cl_int;\ntypedef void* cl_mem;\n"
            "typedef void* cl_command_queue;\ntypedef void* cl_context;\n"
            "typedef void* cl_program;\ntypedef void* cl_kernel;\n"
            "typedef void* cl_device_id;\n"
            "namespace cl { class Buffer {}; class Device {}; class Error {};\n"
            "class Context {}; class Program {}; class Kernel {};\n"
            "class CommandQueue {}; class Platform {}; }\n"
        ),
        "CL/opencl.h": '#pragma once\n#include "CL/cl.hpp"\n',
        "cuda_runtime.h": "typedef void* cudaStream_t;\n",
        "harness.cpp": (
            "#include <cstdio>\n#include <cstring>\n#include <vector>\n"
            "extern int LzssEncodeMemory(unsigned char*,int,unsigned char*,int,int*);\n"
            "extern int LzssDecodeMemory(unsigned char*,int,unsigned char*,int,int*);\n"
            "int main(int argc, char** argv){\n"
            "  std::vector<unsigned char> in; int ch;\n"
            "  while((ch=getchar())!=EOF) in.push_back((unsigned char)ch);\n"
            "  int n=(int)in.size();\n"
            "  if(argc>1 && !strcmp(argv[1],\"-d\")){\n"
            "    std::vector<unsigned char> out(10000000); int osz=0;\n"
            "    if(LzssDecodeMemory(in.data(),n,out.data(),(int)out.size(),&osz)) return 2;\n"
            "    fwrite(out.data(),1,osz,stdout);\n"
            "  } else {\n"
            "    std::vector<unsigned char> out(n+n/8+100); int osz=(int)out.size();\n"
            "    if(LzssEncodeMemory(in.data(),n,out.data(),(int)out.size(),&osz)) return 2;\n"
            "    fwrite(out.data(),1,osz,stdout);\n"
            "  }\n  return 0;\n}\n"
        ),
    }
    for rel, content in stubs.items():
        with open(os.path.join(d, rel), "w") as f:
            f.write(content)
    srcs = [os.path.join(REF_LZSS_SRC, s)
            for s in ("lzss.cpp", "brute.cpp", "bitmemory.cpp", "bitfile.cpp")]
    r = subprocess.run(
        ["g++", "-O2", "-I", d, "-I", REF_LZSS_SRC, "-o", exe,
         os.path.join(d, "harness.cpp"), *srcs],
        capture_output=True,
    )
    return exe if r.returncode == 0 and os.path.exists(exe) else None


@pytest.mark.skipif(
    _build_reference_oracle() is None,
    reason="g++ or reference lzsslib sources unavailable",
)
def test_bit_exact_vs_reference_build():
    """Encoder output is byte-identical to the reference's
    LzssEncodeMemory, and both decoders accept each other's streams.
    Inputs >= 18 bytes only: shorter ones make the reference's lookahead
    read uninitialized stack memory (lzss.cpp:507-516), so only decode
    interop is defined there (covered at the end)."""
    exe = _build_reference_oracle()

    def ref(data: bytes, *args: str) -> bytes:
        p = subprocess.run([exe, *args], input=data, capture_output=True)
        assert p.returncode == 0
        return p.stdout

    rng = random.Random(99)
    for i in range(12):
        n = rng.choice([18, 40, 300, 4096, 4100, 9000])
        data = {
            0: lambda: rng.randbytes(n),
            1: lambda: (b"spark " * (n // 6 + 1))[:n],
            2: lambda: bytes(rng.choice(b"ab ") for _ in range(n)),
        }[i % 3]()
        mine = lzss_encode(data)
        assert mine == ref(data), f"encode mismatch at n={n}"
        assert ref(mine, "-d") == data
        assert lzss_decode(ref(data)) == data
    for short in (b"x", b"hello", b"aaaaaaa", b" " * 17):
        assert ref(lzss_encode(short), "-d") == short
        assert lzss_decode(ref(short)) == short


def test_decode_wrapping_copy_token():
    """Hand-built stream whose coded token crosses the circular-window
    boundary: 5 literals 'ABCDE' (window slots 0..4), then a coded token
    (offset 4094, length 4) reading slots 4094,4095,0,1 of the PRE-token
    window — two pre-filled spaces then 'AB'.  Exercises decode's
    two-segment copy path explicitly."""
    from dedup_gpu_stream_parallelism_spark.functions.lzss_codec import (
        _BitWriter,
        lzss_decode,
    )

    w = _BitWriter()
    for ch in b"ABCDE":
        w.put(0x100 | ch, 9)
    w.put(0, 1)            # ENCODED flag
    w.put(4094 & 0xFF, 8)  # offset low byte
    w.put(4094 >> 8, 4)    # offset high nibble
    w.put(4 - 3, 4)        # length 4 -> stored 1
    assert lzss_decode(w.tobytes()) == b"ABCDE  AB"


def test_decode_discards_truncated_literal():
    """A stream ending with an UNCODED flag but fewer than 8 literal bits
    drops the partial token (LzssDecodeMemory's EOF semantics)."""
    from dedup_gpu_stream_parallelism_spark.functions.lzss_codec import (
        _BitWriter,
        lzss_decode,
    )

    w = _BitWriter()
    w.put(0x100 | ord("Q"), 9)
    w.put(0b11111, 5)  # flag 1 + only 4 literal bits, then EOF
    assert lzss_decode(w.tobytes()) == b"Q"


@pytest.mark.skipif(
    _build_reference_oracle() is None,
    reason="g++ or reference lzsslib sources unavailable",
)
def test_bit_exact_structured_shapes_vs_reference():
    """Targeted fuzz for the trigram-index encoder's distinct paths:
    periodic source-code-like text (dense candidate sets, full-length
    matches), RLE runs (near-candidate d=1/2 wins, window-head wraps),
    short periods (multi-phase candidates), and block repeats spanning
    more than one window (fingerprint-scale redundancy)."""
    exe = _build_reference_oracle()

    def ref(data: bytes, *args: str) -> bytes:
        p = subprocess.run([exe, *args], input=data, capture_output=True)
        assert p.returncode == 0
        return p.stdout

    rng = random.Random(31337)
    line = b"def f_%d(x):\n    return x + %d\n"
    shapes = [
        (b"".join(line % (i % 7, i % 13) for i in range(400))),   # periodic
        b"z" * 5000,                                              # pure RLE
        b"ab" * 3000,                                             # period 2
        b"abc" * 2500,                                            # period 3
        (b"xy" * 10) + b"Q" + (b"xy" * 2100),                     # phase break
        rng.randbytes(5000) * 2,                                  # window-span repeat
        bytes(rng.choice(b"\t\n ae") for _ in range(8000)),       # tiny alphabet
        b" " * 4200 + b"end",                                     # space prefill + beyond
    ]
    for data in shapes:
        mine = lzss_encode(data)
        assert mine == ref(data), f"encode mismatch on shape {data[:24]!r}"
        assert lzss_decode(mine) == data
        assert ref(mine, "-d") == data


def test_scan_fallback_matches_fast_path(monkeypatch):
    """The >_SKIP_FILTER_MAX_BYTES fallback (_encode_scan: per-token
    window scan through _BitWriter) and the find-driven fast path are
    INDEPENDENT matcher+emitter implementations of the same spec — force
    the fallback by shrinking the cap and require identical streams."""
    from dedup_gpu_stream_parallelism_spark.functions import lzss_codec

    rng = random.Random(7)
    payloads = [
        bytes(rng.randrange(256) for _ in range(n)) for n in (1, 17, 18, 600)
    ] + [
        bytes(rng.choice(b"ab c") for _ in range(5000)),
        b"x" * 900,
        (b"def f(): return chunk\n" * 80)[:1500],
    ]
    want = [lzss_codec.lzss_encode(p) for p in payloads]
    monkeypatch.setattr(lzss_codec, "_SKIP_FILTER_MAX_BYTES", 0)
    got = [lzss_codec.lzss_encode(p) for p in payloads]
    assert got == want
    for p, enc in zip(payloads, got):
        assert lzss_decode(enc) == p


def test_long_literal_run_emission_boundary():
    """Literal runs around _LONG_LIT_RUN (32) cross between the emission
    paths (contiguous unpackbits block vs column scatter); verify streams
    across the boundary against the independent scan-path emitter."""
    from dedup_gpu_stream_parallelism_spark.functions import lzss_codec

    rng = random.Random(11)
    rep = b"0123456789abcdefghij"  # codes once the window has seen it
    for run_len in (30, 31, 32, 33, 64):
        lits = bytes(rng.randrange(256) for _ in range(run_len))
        payload = rep * 3 + lits + rep * 2 + lits[:run_len // 2] + rep
        enc = lzss_codec.lzss_encode(payload)
        assert lzss_decode(enc) == payload
        w = lzss_codec._BitWriter()
        import numpy as np

        V = np.empty(WINDOW_SIZE + len(payload), dtype=np.uint8)
        V[:WINDOW_SIZE] = 0x20
        V[WINDOW_SIZE:] = np.frombuffer(payload, dtype=np.uint8)
        ref = lzss_codec._encode_scan(V, len(payload), w, np.arange(MAX_CODED))
        assert enc == ref


@pytest.mark.skipif(
    _build_reference_oracle() is None,
    reason="g++ or reference lzsslib sources unavailable",
)
def test_decode_adversarial_streams_vs_reference():
    """Decode ARBITRARY byte blobs — bit streams no encoder emits — and
    match LzssDecodeMemory byte-for-byte.  Pins the run-level pass-1 walk
    (maximal literal/coded runs, truncated-token discard) and the
    wrap-copy arithmetic on inputs where token kinds, offsets and lengths
    are unconstrained, not just on well-formed encoder output."""
    import numpy as np

    exe = _build_reference_oracle()

    def ref_decode(blob: bytes) -> bytes:
        p = subprocess.run([exe, "-d"], input=blob, capture_output=True)
        assert p.returncode == 0
        return p.stdout

    rng = random.Random(2718)
    nprng = np.random.default_rng(2718)
    for trial in range(60):
        n = rng.choice([1, 2, 3, 17, 64, 400, 2000])
        if trial % 3 == 0:
            blob = rng.randbytes(n)  # uniform bits: mixed short runs
        else:
            # biased bit density: long literal runs (p1 high) or long
            # coded runs (p1 low), crossing the strided-probe boundary
            p1 = 0.95 if trial % 3 == 1 else 0.05
            bits = (nprng.random(n * 8) < p1).astype(np.uint8)
            blob = np.packbits(bits).tobytes()
        assert lzss_decode(blob) == ref_decode(blob), (trial, n, blob.hex())
    # exact run-multiple lengths and trailing partial tokens
    for extra in (0, 1, 5, 8, 9, 16, 17):
        lit_run = np.packbits(np.ones(9 * 40 + extra, dtype=np.uint8)).tobytes()
        cod_run = np.packbits(np.zeros(17 * 40 + extra, dtype=np.uint8)).tobytes()
        assert lzss_decode(lit_run) == ref_decode(lit_run), ("lit", extra)
        assert lzss_decode(cod_run) == ref_decode(cod_run), ("cod", extra)
