"""Two-direction interop with a compiled build of the reference's FULL
``dedup`` pipeline (src/Makefile's ``dedup_sequential`` object set, host-only:
the GPU objects are stubbed — the sequential encode/decode paths never call
them, src/encoder.cpp:66-68 and :764 guard them behind ENABLE_SERIAL_GPU).

The LZSS codec is already fuzz-verified bit-exact against compiled lzsslib
(test_lzss_codec.py) and the record framing against golden bytes
(test_ddp_format.py); this module proves the COMPOSITION:

* reference ``dedup -c -w lzss/none/gzip/bzip2`` output imports through
  ``import_ddp`` and reconstructs the original input byte-for-byte;
* an engine-exported single ``.ddp`` shard feeds ``dedup -u``
  (src/decoder.cpp:200-291) and reconstructs the corpus byte-for-byte.
"""

from __future__ import annotations

import hashlib
import os
import shutil
import subprocess

import pytest

REF_SRC = "/root/reference/src"
REF_LZSS_SRC = "/root/reference/libs/lzsslib/src"
BUILD_DIR = "/tmp/dedup_ref_pytest"

# host-only stubs: gpu_util.h drags in OpenCL types, and dedup.cpp calls
# setDeviceIds() unconditionally — the sequential pipeline never touches a
# device, so empty definitions satisfy the compiler and linker
_STUBS = {
    "CL/cl.hpp": (
        "#pragma once\n#include <vector>\n"
        "typedef int cl_int;\ntypedef void* cl_mem;\n"
        "typedef void* cl_command_queue;\ntypedef void* cl_context;\n"
        "typedef void* cl_program;\ntypedef void* cl_kernel;\n"
        "typedef void* cl_device_id;\n"
        "namespace cl { class Buffer {}; class Device {}; class Error {};\n"
        "class Context {}; class Program {}; class Kernel {};\n"
        "class CommandQueue {}; class Platform {}; }\n"
    ),
    "CL/opencl.h": '#pragma once\n#include "CL/cl.hpp"\n',
    "oclbase.h": "#pragma once\n",
    "cuda_runtime.h": "#pragma once\ntypedef void* cudaStream_t;\n",
    "gpu_util_stub.cpp": (
        '#include "gpu_util.h"\n'
        "static std::vector<int> ids;\n"
        "void setDeviceIds(std::vector<int> deviceIds) { ids = deviceIds; }\n"
        "std::vector<int> getDeviceIds() { return ids; }\n"
    ),
}

_SRCS = [
    "dedup.cpp", "encoder.cpp", "decoder.cpp", "hashtable.cpp", "util.cpp",
    "rabin.cpp", "mbuffer.cpp", "sha.cpp", "queue.cpp", "binheap.cpp",
    "tree.cpp",
]
_LZSS_SRCS = ["lzss.cpp", "brute.cpp", "bitmemory.cpp", "bitfile.cpp"]


def _build_reference_dedup() -> str | None:
    """Compile the reference's sequential dedup binary (cached); None when
    the toolchain or sources are unavailable.  All four compress types are
    enabled (zlib/bz2 come from the system dev headers, same ABI as the
    reference's vendored libs/zlib + libs/bzip2)."""
    exe = os.path.join(BUILD_DIR, "dedup_seq_allcodecs")
    if os.path.exists(exe):
        return exe
    if not shutil.which("g++") or not os.path.isdir(REF_SRC):
        return None
    os.makedirs(os.path.join(BUILD_DIR, "CL"), exist_ok=True)
    for rel, content in _STUBS.items():
        with open(os.path.join(BUILD_DIR, rel), "w") as f:
            f.write(content)
    cmd = [
        "g++", "-O2", "-std=c++11", "-fpermissive", "-w",
        "-DENABLE_LZSS_COMPRESSION",
        "-DENABLE_GZIP_COMPRESSION", "-DENABLE_BZIP2_COMPRESSION",
        "-I", BUILD_DIR, "-I", REF_SRC, "-I", REF_LZSS_SRC,
        "-o", exe,
        os.path.join(BUILD_DIR, "gpu_util_stub.cpp"),
        *[os.path.join(REF_SRC, s) for s in _SRCS],
        *[os.path.join(REF_LZSS_SRC, s) for s in _LZSS_SRCS],
        "-lpthread", "-lz", "-lbz2",
    ]
    r = subprocess.run(cmd, capture_output=True)
    return exe if r.returncode == 0 and os.path.exists(exe) else None


def _run_dedup(exe: str, *args: str) -> None:
    p = subprocess.run([exe, *args], capture_output=True, text=True)
    assert p.returncode == 0, f"dedup {' '.join(args)} failed: {p.stderr[-500:]}"


def _interop_input() -> bytes:
    """Deterministic ~1.5 MiB input with heavy block repeats so the rabin
    CDC pipeline emits both TYPE_COMPRESS and TYPE_FINGERPRINT records."""
    import random

    rng = random.Random(2024)
    blocks = [
        (b"def handler_%d(payload):\n    return payload[%d:]\n" % (i, i)) * 40
        for i in range(12)
    ]
    blocks.append(rng.randbytes(32 * 1024))
    out = bytearray()
    while len(out) < 1_500_000:
        out += rng.choice(blocks)
    return bytes(out)


needs_build = pytest.mark.skipif(
    _build_reference_dedup() is None,
    reason="g++ or reference dedup sources unavailable",
)


@needs_build
@pytest.mark.slow
@pytest.mark.parametrize("codec", ["lzss", "none", "gzip", "bzip2"])
def test_reference_output_imports(spark, tmp_path, codec):
    """dedup -c → import_ddp: the engine decodes a file produced by the
    reference binary itself, byte-for-byte — and agrees with dedup -u."""
    from dedup_gpu_stream_parallelism_spark.sources.ddp_format import import_ddp

    exe = _build_reference_dedup()
    data = _interop_input()
    infile = str(tmp_path / "input.bin")
    ddp = str(tmp_path / "input.bin.ddp")
    restored = str(tmp_path / "restored.bin")
    with open(infile, "wb") as f:
        f.write(data)
    _run_dedup(exe, "-c", "-w", codec, "-i", infile, "-o", ddp)
    # the reference must round-trip its own file (guards the build itself).
    # -w rides along on -u only to pass main()'s compiled-codec gate — the
    # decoder itself takes the codec from the file header (decoder.cpp:227)
    _run_dedup(exe, "-u", "-w", codec, "-i", ddp, "-o", restored)
    with open(restored, "rb") as f:
        assert f.read() == data
    rows = import_ddp(spark, ddp).collect()
    assert len(rows) == 1 and rows[0]["doc_id"] == 0
    assert hashlib.sha256(bytes(rows[0]["data"])).digest() == hashlib.sha256(
        data
    ).digest()


@needs_build
@pytest.mark.slow
@pytest.mark.parametrize("codec", ["lzss", "none", "gzip", "bzip2"])
def test_reference_decodes_engine_export(spark, corpus_df, tmp_path, codec):
    """export_ddp → dedup -u: the reference binary reconstructs an
    engine-written single-shard stream byte-for-byte."""
    from dedup_gpu_stream_parallelism_spark.sources.ddp_format import export_ddp

    exe = _build_reference_dedup()
    out_dir = str(tmp_path / f"export_{codec}")
    export_ddp(
        corpus_df, out_dir, id_col="file_id", text_col="content",
        n_shards=1, compress_type=codec,
    )
    shard = os.path.join(out_dir, "shard-00000.ddp")
    assert os.path.exists(shard)
    restored = str(tmp_path / f"restored_{codec}.bin")
    _run_dedup(exe, "-u", "-w", codec, "-i", shard, "-o", restored)
    # stream order is (doc_id, chunk_idx), so dedup -u's concatenated
    # output is the corpus text in file_id order
    expected = b"".join(
        r["content"].encode("utf-8")
        for r in corpus_df.select("file_id", "content")
        .orderBy("file_id")
        .collect()
    )
    with open(restored, "rb") as f:
        got = f.read()
    assert hashlib.sha256(got).digest() == hashlib.sha256(expected).digest()
