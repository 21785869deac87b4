"""LZF compression codec used by PCD ``binary_compressed`` bodies.

Re-implementation of the LZF format (reference: io/include/pcl/io/lzf.h,
io/src/lzf.cpp — itself derived from Marc Lehmann's liblzf). The format:

- control byte ``c < 32``: literal run of ``c+1`` bytes follows.
- otherwise a back-reference: length ``(c >> 5) + 2`` (if the 3-bit length
  field is 7, an extension byte adds to it), offset ``((c & 0x1f) << 8) |
  next_byte`` counting back from the current output position minus one.

A C implementation is compiled on first use for speed (PCD bodies are MBs);
a pure-Python fallback keeps the codec dependency-free.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import tempfile
from typing import Optional

_C_SRC = r"""
#include <stdint.h>
#include <string.h>

/* LZF decompression: returns bytes written, or 0 on malformed input. */
long lzf_decompress(const uint8_t *in, long in_len, uint8_t *out, long out_len) {
    const uint8_t *ip = in, *in_end = in + in_len;
    uint8_t *op = out, *out_end = out + out_len;
    while (ip < in_end) {
        unsigned int ctrl = *ip++;
        if (ctrl < 32) {                      /* literal run */
            ctrl++;
            if (op + ctrl > out_end || ip + ctrl > in_end) return 0;
            memcpy(op, ip, ctrl);
            op += ctrl; ip += ctrl;
        } else {                              /* back reference */
            unsigned int len = ctrl >> 5;
            const uint8_t *ref;
            if (ip >= in_end) return 0;
            if (len == 7) { len += *ip++; if (ip >= in_end) return 0; }
            ref = op - ((ctrl & 0x1f) << 8) - 1 - *ip++;
            len += 2;
            if (op + len > out_end || ref < out) return 0;
            /* overlapping copy must be byte-wise */
            while (len--) *op++ = *ref++;
        }
    }
    return (long)(op - out);
}

#define HLOG 14
#define HSIZE (1 << HLOG)
#define MAX_LIT (1 << 5)
#define MAX_OFF (1 << 13)
#define MAX_REF ((1 << 8) + (1 << 3))

static unsigned int first(const uint8_t *p) { return (p[0] << 8) | p[1]; }
static unsigned int next_h(unsigned int v, const uint8_t *p) { return (v << 8) | p[2]; }
static unsigned int idx(unsigned int h) {
    return (((h >> (3*8 - HLOG)) - h*5) & (HSIZE - 1));
}

/* LZF compression: returns compressed size, or 0 if output would not fit. */
long lzf_compress(const uint8_t *in, long in_len, uint8_t *out, long out_len) {
    const uint8_t *htab[HSIZE];
    const uint8_t *ip = in, *in_end = in + in_len;
    uint8_t *op = out, *out_end = out + out_len;
    unsigned int hval;
    long lit = 0;
    memset(htab, 0, sizeof(htab));
    if (in_len < 3) goto tail;
    hval = first(ip);
    while (ip + 2 < in_end) {
        unsigned int h;
        const uint8_t *ref;
        hval = next_h(hval, ip);
        h = idx(hval);
        ref = htab[h];
        htab[h] = ip;
        long off;
        if (ref && (off = ip - ref - 1) < MAX_OFF && ref >= in
            && ref[0] == ip[0] && ref[1] == ip[1] && ref[2] == ip[2]) {
            /* match: first flush literals. Minimum emitted length is 3
             * (ref[0..2]==ip[0..2] just verified): the format stores
             * len-2 in a 3-bit field whose value 0 would alias into a
             * LITERAL control byte — a "length-2 match" is unencodable
             * and silently corrupted the stream near buffer ends. */
            long len = 3;
            long maxlen = in_end - ip;
            if (maxlen > MAX_REF) maxlen = MAX_REF;
            while (len < maxlen && ref[len] == ip[len]) len++;
            if (op + lit + 1 + 3 >= out_end) return 0;
            if (lit) { *op++ = (uint8_t)(lit - 1); memcpy(op, ip - lit, lit); op += lit; lit = 0; }
            len -= 2;
            if (len < 7) {
                *op++ = (uint8_t)((off >> 8) + (len << 5));
            } else {
                *op++ = (uint8_t)((off >> 8) + (7 << 5));
                *op++ = (uint8_t)(len - 7);
            }
            *op++ = (uint8_t)off;
            ip += len + 2;
            if (ip + 2 < in_end) {
                hval = first(ip);
            }
            continue;
        }
        lit++;
        ip++;
        if (lit == MAX_LIT) {
            if (op + 1 + MAX_LIT >= out_end) return 0;
            *op++ = MAX_LIT - 1;
            memcpy(op, ip - lit, lit); op += lit; lit = 0;
        }
    }
tail:
    while (ip < in_end) {
        lit++; ip++;
        if (lit == MAX_LIT) {
            if (op + 1 + MAX_LIT >= out_end) return 0;
            *op++ = MAX_LIT - 1;
            memcpy(op, ip - lit, lit); op += lit; lit = 0;
        }
    }
    if (lit) {
        if (op + lit + 1 >= out_end) return 0;
        *op++ = (uint8_t)(lit - 1);
        memcpy(op, ip - lit, lit); op += lit;
    }
    return (long)(op - out);
}
"""

_lib: Optional[ctypes.CDLL] = None
_lib_failed = False


def _build_lib() -> Optional[ctypes.CDLL]:
    global _lib_failed
    cache_dir = os.path.join(os.path.dirname(__file__), "_native")
    os.makedirs(cache_dir, exist_ok=True)
    so_path = os.path.join(cache_dir, "liblzf_pcltpu.so")
    src_path = os.path.join(cache_dir, "lzf_pcltpu.c")
    try:
        if not os.path.exists(so_path):
            with open(src_path, "w") as f:
                f.write(_C_SRC)
            subprocess.run(
                ["gcc", "-O3", "-fPIC", "-shared", "-o", so_path, src_path],
                check=True, capture_output=True,
            )
        lib = ctypes.CDLL(so_path)
        for name in ("lzf_decompress", "lzf_compress"):
            fn = getattr(lib, name)
            fn.restype = ctypes.c_long
            fn.argtypes = [ctypes.c_char_p, ctypes.c_long, ctypes.c_char_p, ctypes.c_long]
        return lib
    except Exception:
        _lib_failed = True
        return None


def _get_lib() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is None and not _lib_failed:
        _lib = _build_lib()
    return _lib


def decompress(data: bytes, expected_size: int) -> bytes:
    lib = _get_lib()
    if lib is not None:
        out = ctypes.create_string_buffer(expected_size)
        n = lib.lzf_decompress(data, len(data), out, expected_size)
        if n != expected_size:
            raise ValueError(f"LZF decompress produced {n} bytes, expected {expected_size}")
        return out.raw
    return _decompress_py(data, expected_size)


def compress(data: bytes) -> bytes:
    """Compress; raises ValueError if data is incompressible beyond bound."""
    lib = _get_lib()
    bound = max(len(data) * 2 + 64, 1024)
    if lib is not None:
        out = ctypes.create_string_buffer(bound)
        n = lib.lzf_compress(data, len(data), out, bound)
        if n <= 0:
            raise ValueError("LZF compression failed")
        return out.raw[:n]
    return _compress_py(data)


# ---------------------------------------------------------------------------
# Pure-Python fallback
# ---------------------------------------------------------------------------

def _decompress_py(data: bytes, expected_size: int) -> bytes:
    out = bytearray(expected_size)
    ip, op, n = 0, 0, len(data)
    while ip < n:
        ctrl = data[ip]; ip += 1
        if ctrl < 32:
            run = ctrl + 1
            out[op:op + run] = data[ip:ip + run]
            ip += run; op += run
        else:
            length = ctrl >> 5
            if length == 7:
                length += data[ip]; ip += 1
            length += 2
            ref = op - ((ctrl & 0x1F) << 8) - 1 - data[ip]; ip += 1
            if ref < 0:
                raise ValueError("LZF back-reference before start")
            for _ in range(length):
                out[op] = out[ref]
                op += 1; ref += 1
    if op != expected_size:
        raise ValueError(f"LZF decompress produced {op} bytes, expected {expected_size}")
    return bytes(out)


def _compress_py(data: bytes) -> bytes:
    """Trivially valid LZF stream: all-literal runs (no compression).
    Correct per format; used only when the C library is unavailable."""
    out = bytearray()
    for i in range(0, len(data), 32):
        chunk = data[i:i + 32]
        out.append(len(chunk) - 1)
        out.extend(chunk)
    return bytes(out)
