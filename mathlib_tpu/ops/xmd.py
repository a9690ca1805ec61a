"""Device-side expand_message_xmd (SHA-256) + hash_to_field embedding.

The reference's hash-to-curve pipelines run the XMD expansion on the CPU
(gnark ExpandMsgXmd at driver/gurvy/custom.go:53-131, kilic expandMsgXMD at
driver/kilic/custom.go:258-310).  Round-3 profiling showed the TPU pipeline
(SSWU + isogeny + cofactor) finishing a 4096-point batch in ~0.3 ms while the
host Python XMD + mod-p embedding took ~160 ms — 99.8% host-bound.  This
module moves the whole RFC 9380 §5.3.1 expansion onto the device as plain
u32 lane arithmetic (SHA-256 is 32-bit adds/rotates — a perfect VPU fit),
so hashing N messages becomes ONE jitted program:

    host:   pack the (fixed-structure) padded SHA-256 blocks of
            b_0 = H(Z_pad || msg || l_i_b || 0 || DST') as numpy bytes
            (microseconds — pure byte shuffling, no hashing),
    device: b_0, then b_i = H((b_0 ^ b_{i-1}) || i || DST') for i = 1..ell
            (RFC 9380 §5.3.1 steps 7-9), the big-endian digest-to-integer
            reassembly, and the mod-p embedding
            u = (hi*2^(8*(L-32)+256-...)) ... computed exactly as
            u_lo + 2^256 * u_hi  (mod p) in Montgomery form:
            enc(u) = mont_mul(u_lo, R^2) + mont_mul(u_hi, 2^256 * R^2).

mont_mul tolerates the wide operand: u_lo, u_hi < 2^256 <= R and the
constant is < p, so the output stays in the relaxed [0, 2p) domain
(ops/field.py mont_mul bound: out < a*b/R + p < 2p).

The fast path requires all messages in the batch to share one length (the
padded-block layout is then a static shape); mixed-length batches fall back
to the per-message host path in host/hash_to_curve.py.  Byte-equality with
the host XMD is pinned by tests/test_device_hash.py.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .field import FpCtx, int_to_limbs

Array = jax.Array

_K = np.array(
    [
        0x428A2F98, 0x71374491, 0xB5C0FBCF, 0xE9B5DBA5, 0x3956C25B, 0x59F111F1,
        0x923F82A4, 0xAB1C5ED5, 0xD807AA98, 0x12835B01, 0x243185BE, 0x550C7DC3,
        0x72BE5D74, 0x80DEB1FE, 0x9BDC06A7, 0xC19BF174, 0xE49B69C1, 0xEFBE4786,
        0x0FC19DC6, 0x240CA1CC, 0x2DE92C6F, 0x4A7484AA, 0x5CB0A9DC, 0x76F988DA,
        0x983E5152, 0xA831C66D, 0xB00327C8, 0xBF597FC7, 0xC6E00BF3, 0xD5A79147,
        0x06CA6351, 0x14292967, 0x27B70A85, 0x2E1B2138, 0x4D2C6DFC, 0x53380D13,
        0x650A7354, 0x766A0ABB, 0x81C2C92E, 0x92722C85, 0xA2BFE8A1, 0xA81A664B,
        0xC24B8B70, 0xC76C51A3, 0xD192E819, 0xD6990624, 0xF40E3585, 0x106AA070,
        0x19A4C116, 0x1E376C08, 0x2748774C, 0x34B0BCB5, 0x391C0CB3, 0x4ED8AA4A,
        0x5B9CCA4F, 0x682E6FF3, 0x748F82EE, 0x78A5636F, 0x84C87814, 0x8CC70208,
        0x90BEFFFA, 0xA4506CEB, 0xBEF9A3F7, 0xC67178F2,
    ],
    dtype=np.uint32,
)

_H0 = np.array(
    [0x6A09E667, 0xBB67AE85, 0x3C6EF372, 0xA54FF53A,
     0x510E527F, 0x9B05688C, 0x1F83D9AB, 0x5BE0CD19],
    dtype=np.uint32,
)


def _rotr(x: Array, n: int) -> Array:
    return (x >> n) | (x << (32 - n))


def _compress(state: Array, w16: Array) -> Array:
    """One SHA-256 compression: state (8, N) u32, block words (16, N) u32.

    Fully unrolled (no lax.scan): the round body is a handful of u32
    elementwise ops, so per-step scan dispatch would dominate on TPU;
    unrolled, XLA fuses the whole block into a few VPU loops."""
    w = [w16[i] for i in range(16)]
    for i in range(16, 64):
        s0 = _rotr(w[i - 15], 7) ^ _rotr(w[i - 15], 18) ^ (w[i - 15] >> 3)
        s1 = _rotr(w[i - 2], 17) ^ _rotr(w[i - 2], 19) ^ (w[i - 2] >> 10)
        w.append(w[i - 16] + s0 + w[i - 7] + s1)
    a, b, c, d, e, f, g, h = (state[i] for i in range(8))
    for i in range(64):
        s1 = _rotr(e, 6) ^ _rotr(e, 11) ^ _rotr(e, 25)
        ch = (e & f) ^ (~e & g)
        t1 = h + s1 + ch + jnp.uint32(_K[i]) + w[i]
        s0 = _rotr(a, 2) ^ _rotr(a, 13) ^ _rotr(a, 22)
        maj = (a & b) ^ (a & c) ^ (b & c)
        a, b, c, d, e, f, g, h = t1 + s0 + maj, a, b, c, d + t1, e, f, g
    return jnp.stack([a, b, c, d, e, f, g, h], axis=0) + state


def sha256_device(blocks: Array) -> Array:
    """Padded message blocks (nblk, 16, N) u32 BE words -> digest (8, N)."""
    st = jnp.broadcast_to(jnp.asarray(_H0)[:, None], (8, blocks.shape[-1]))
    for k in range(blocks.shape[0]):
        st = _compress(st, blocks[k])
    return st


# ---------------------------------------------------------------------------
# host packing (numpy byte shuffling only — no hashing)
# ---------------------------------------------------------------------------


def _pad_to_blocks(pre_len: int) -> int:
    """SHA-256 block count for a pre_len-byte message (incl. 0x80 + length)."""
    return (pre_len + 8) // 64 + 1


def _bytes_to_words(buf: np.ndarray) -> np.ndarray:
    """(N, nblk*64) u8 -> (nblk, 16, N) u32 big-endian words."""
    n, total = buf.shape
    w = buf.reshape(n, total // 64, 16, 4).astype(np.uint32)
    words = (w[..., 0] << 24) | (w[..., 1] << 16) | (w[..., 2] << 8) | w[..., 3]
    return np.ascontiguousarray(np.transpose(words, (1, 2, 0)))


def pack_b0_blocks(msgs: Sequence[bytes], dst: bytes, out_len: int) -> np.ndarray:
    """Pack b_0 = H(Z_pad || msg || l_i_b || 0x00 || DST') padded blocks.

    All messages must share one length (checked by the caller).  Returns
    (nblk, 16, N) u32 big-endian words ready for sha256_device.
    """
    n = len(msgs)
    m = len(msgs[0])
    dst_prime = dst + bytes([len(dst)])
    pre_len = 64 + m + 2 + 1 + len(dst_prime)
    nblk = _pad_to_blocks(pre_len)
    buf = np.zeros((n, nblk * 64), dtype=np.uint8)
    if m:
        buf[:, 64 : 64 + m] = np.frombuffer(b"".join(msgs), np.uint8).reshape(n, m)
    tail = out_len.to_bytes(2, "big") + b"\x00" + dst_prime
    buf[:, 64 + m : pre_len] = np.frombuffer(tail, np.uint8)
    buf[:, pre_len] = 0x80
    buf[:, -8:] = np.frombuffer((pre_len * 8).to_bytes(8, "big"), np.uint8)
    return _bytes_to_words(buf)


def pack_msg_words(msgs: Sequence[bytes], mlen: int) -> np.ndarray:
    """(mlen//4, N) u32 BE words of the raw messages (mlen % 4 == 0).

    Everything in the b_0 preimage EXCEPT the message bytes is constant
    across the batch (Z_pad zeros, l_i_b, DST', SHA padding), so only
    these words need to cross the host->device tunnel — ~6x fewer bytes
    than the packed blocks for 32-byte messages (measured fixed-cost
    lever, round 5)."""
    n = len(msgs)
    return (
        np.frombuffer(b"".join(msgs), dtype=">u4")
        .reshape(n, mlen // 4)
        .T.astype(np.uint32)
    )


def b0_template(mlen: int, dst: bytes, out_len: int) -> np.ndarray:
    """(nblk*16,) u32 constant words of the b_0 preimage for any message
    of length mlen: the message slot (words 16 .. 16+mlen//4) is zero."""
    return pack_b0_blocks([bytes(mlen)], dst, out_len)[:, :, 0].reshape(-1)


def b0_blocks_device(msg_w: Array, tmpl: np.ndarray, mlen: int) -> Array:
    """Assemble (nblk, 16, N) b_0 preimage blocks ON DEVICE from the
    per-message words + the constant template (message starts at byte 64
    = word 16; mlen % 4 == 0 keeps the slot word-aligned)."""
    w = mlen // 4
    n = msg_w.shape[-1]
    t = jnp.asarray(tmpl)
    pre = jnp.broadcast_to(t[:16, None], (16, n))
    post = jnp.broadcast_to(t[16 + w :, None], (t.shape[0] - 16 - w, n))
    return jnp.concatenate([pre, msg_w, post], axis=0).reshape(-1, 16, n)


def _bi_template(dst: bytes, i: int) -> np.ndarray:
    """Constant words of the b_i preimage block(s): 32 zero bytes (the
    digest slot, filled on device) || i || DST' || SHA padding.
    Returns (nblk, 16) u32."""
    dst_prime = dst + bytes([len(dst)])
    pre = bytes(32) + bytes([i]) + dst_prime
    nblk = _pad_to_blocks(len(pre))
    buf = np.zeros((1, nblk * 64), dtype=np.uint8)
    buf[0, : len(pre)] = np.frombuffer(pre, np.uint8)
    buf[0, len(pre)] = 0x80
    buf[0, -8:] = np.frombuffer((len(pre) * 8).to_bytes(8, "big"), np.uint8)
    return _bytes_to_words(buf)[..., 0]  # (nblk, 16)


def xmd_sha256_device(blocks0: Array, templates: Sequence[np.ndarray]) -> Array:
    """RFC 9380 expand_message_xmd on device.

    blocks0: packed b_0 preimage (nblk0, 16, N); templates: per-i constant
    words from _bi_template.  Returns the uniform bytes as (8*ell, N) u32
    big-endian words (b_1 || ... || b_ell).
    """
    n = blocks0.shape[-1]
    b0 = sha256_device(blocks0)
    outs: List[Array] = []
    prev = b0
    for idx, tmpl in enumerate(templates):
        x = b0 if idx == 0 else b0 ^ prev
        blk = jnp.broadcast_to(
            jnp.asarray(tmpl)[:, :, None], tmpl.shape + (n,)
        )
        blk = blk.at[0, :8].set(x)
        prev = sha256_device(blk)
        outs.append(prev)
    return jnp.concatenate(outs, axis=0)


# ---------------------------------------------------------------------------
# digest words -> field elements (mod-p embedding, on device)
# ---------------------------------------------------------------------------


class FieldEmbed:
    """int.from_bytes(uniform[i*L:(i+1)*L], 'big') % p, in Montgomery form.

    L is the RFC hash_to_field byte length (64 for 48-byte fields, 48
    otherwise) and must be a multiple of 4 so slices align on u32 words.
    """

    def __init__(self, fp: FpCtx, l_bytes: int):
        assert l_bytes % 4 == 0
        self.fp = fp
        self.l_bytes = l_bytes
        self.words = l_bytes // 4
        r2 = fp.r2
        # enc(u) = mont_mul(u_lo, R^2) + mont_mul(u_hi, 2^256 * R^2)
        self.c_lo = int_to_limbs(r2, fp.L)[:, None]
        self.c_hi = int_to_limbs((r2 << 256) % fp.p, fp.L)[:, None]

    def _limbs(self, words: Array, lo: int, hi: int) -> Array:
        """16-bit limbs lo..hi-1 of the big integer behind (W, N) BE words,
        zero-padded to (L, N)."""
        w = self.words
        n = words.shape[-1]
        rows = []
        for k in range(lo, hi):
            rows.append((words[w - 1 - k // 2] >> (16 * (k % 2))) & 0xFFFF)
        pad = self.fp.L - len(rows)
        rows += [jnp.zeros((n,), jnp.uint32)] * pad
        return jnp.stack(rows, axis=0)

    def embed(self, words: Array) -> Array:
        """(W, N) u32 BE words -> (L, N) Montgomery limbs of value mod p."""
        fp = self.fp
        total = 2 * self.words  # 16-bit limbs in the input
        lo = self._limbs(words, 0, min(16, total))
        out = fp.mont_mul(lo, jnp.asarray(self.c_lo))
        if total > 16:
            hi = self._limbs(words, 16, total)
            out = fp.add(out, fp.mont_mul(hi, jnp.asarray(self.c_hi)))
        return out


def hash_to_field_device(
    fp: FpCtx, blocks0: Array, dst: bytes, count: int, l_bytes: int
) -> Tuple[Array, ...]:
    """Full device hash_to_field: packed b_0 blocks -> count field elements.

    Matches host hash_to_field_fp (sha256) exactly mod p; outputs are in
    the relaxed Montgomery domain of FpCtx.
    """
    out_len = count * l_bytes
    ell = (out_len + 31) // 32
    templates = [_bi_template(dst, i) for i in range(1, ell + 1)]
    uniform = xmd_sha256_device(blocks0, templates)  # (8*ell, N)
    emb = FieldEmbed(fp, l_bytes)
    w = l_bytes // 4
    return tuple(emb.embed(uniform[i * w : (i + 1) * w]) for i in range(count))
