"""Batched TPU engine: the throughput-oriented API of the framework.

The mathlib-compatible wrapper API (mathlib_tpu.api) mirrors the reference
one-element-at-a-time interface (math.go).  This module is the TPU-native
surface: arrays of group elements / scalars, jitted batched kernels, and
mesh-sharded collectives — the interface a production verifier (batch BLS,
anonymous-credential issuance, SNARK aggregation) actually wants.

All methods accept/return host objects at the boundary (ints, affine
tuples) or raw device arrays for composition; jit caches are per-engine.
"""

from __future__ import annotations

from functools import lru_cache
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .curves.params import CurveID, CURVE_ID_SPEC, CurveSpec, get_spec
from .host.engine import get_engine
from .host.hash_to_curve import get_hasher
from .ops.g1 import G1Ctx, get_g1_ctx
from .ops.g2 import G2Ctx, get_g2_ctx
from .ops.msm import msm, msm_naive
from .ops.pairing import PairingCtx, get_pairing_ctx
from .ops.tower import TowerCtx, get_tower_ctx

Array = jax.Array


class BatchEngine:
    """Batched device engine for one curve configuration."""

    def __init__(self, spec: CurveSpec):
        self.spec = spec
        self.g1: G1Ctx = get_g1_ctx(spec)
        self.g2: G2Ctx = get_g2_ctx(spec)
        self.tw: TowerCtx = get_tower_ctx(spec)
        self.pair: PairingCtx = get_pairing_ctx(spec)
        self.host = get_engine(spec)
        self._jit = {}

    @classmethod
    def for_curve(cls, curve_id: CurveID) -> "BatchEngine":
        return get_batch_engine(get_spec(CURVE_ID_SPEC[curve_id]))

    def _cached(self, name, fn):
        if name not in self._jit:
            self._jit[name] = jax.jit(fn)
        return self._jit[name]

    # ------------------------------------------------------------- G1 -------
    def _msm_params(self, n: int, c: Optional[int], glv: Optional[bool]):
        """Resolve window width / GLV from the measured cost model unless
        the caller pins them (VERDICT r3 #7: no caller tuning needed —
        defaults match bench.py's auto-sized path at every n)."""
        from .ops.msm import auto_glv, auto_window

        if c is None:
            c = auto_window(n, self.g1.nbits)
        if glv is None:
            glv = auto_glv(self.spec, n)
        return c, glv

    def g1_msm(self, points, scalars, c: Optional[int] = None,
               glv: Optional[bool] = None):
        """MSM over host inputs; returns one affine host point.

        The device pipeline is ops/msm.py (Pippenger, Pallas kernels on
        TPU); correctness oracle math_test.go:323-346.  Window width and
        the GLV split auto-size from n unless given.
        """
        P = self.g1.encode_points(points)
        S = self.g1.encode_scalars([int(s) for s in scalars])
        c, glv = self._msm_params(P.shape[-1], c, glv)
        f = self._cached(
            ("msm", c, glv), lambda p, s: msm(self.g1, p, s, c=c, glv=glv)
        )
        return self.g1.decode_point(f(P, S))

    def g1_msm_device(self, P: Array, S: Array, c: Optional[int] = None,
                      glv: Optional[bool] = None) -> Array:
        c, glv = self._msm_params(P.shape[-1], c, glv)
        f = self._cached(
            ("msm", c, glv), lambda p, s: msm(self.g1, p, s, c=c, glv=glv)
        )
        return f(P, S)

    def g1_scalar_mul(self, points, scalars) -> List:
        P = self.g1.encode_points(points)
        S = self.g1.encode_scalars([int(s) for s in scalars])
        # affinize ON DEVICE (tree batch inversion, one pow-chain launch)
        # so host decode does no per-point modular inverse
        f = self._cached(
            "g1_smul_aff",
            lambda p, s: self.g1.to_affine_rows(self.g1.scalar_mul(p, s)),
        )
        return self.g1.decode_points_affine(f(P, S))

    # ------------------------------------------------------------- G2 -------
    def g2_scalar_mul(self, points, scalars) -> List:
        P = self.g2.encode_points(points)
        S = self.g2.encode_scalars([int(s) for s in scalars])
        f = self._cached("g2_smul", self.g2.scalar_mul)
        return self.g2.decode_points(f(P, S))

    # ---------------------------------------------------------- pairing -----
    def _encode_pairs(self, g1_points, g2_points):
        """Affine pair lists -> ONE plain (non-Montgomery) (6, L, N) array.

        ``encode_plain`` is one C-speed to_bytes pass per element (the old
        per-element Python Montgomery mulmod cost ~70 ms at 1024 pairs),
        and packing all six coordinate columns into a single array makes
        the check ONE host->device transfer instead of four sequential
        tunnel round trips.  The array stays uint16 — half the wire bytes
        through the ~95 MB/s tunnel — and the widen + Montgomery entry +
        split back into (xP, yP, Qx, Qy) happen in-graph via
        ``_pair_split_mont``."""
        fp = self.g1.fp
        cols = (
            [P[0] for P in g1_points],
            [P[1] for P in g1_points],
            [Q[0][0] for Q in g2_points],
            [Q[0][1] for Q in g2_points],
            [Q[1][0] for Q in g2_points],
            [Q[1][1] for Q in g2_points],
        )
        return np.stack([fp.encode_plain(c, wide=False) for c in cols])

    def _pair_split_mont(self, packed):
        """Traced widen + Montgomery entry + unpack of the (6, L, N)
        uint16 pair array."""
        m = self.g1.fp.to_mont(packed.astype(jnp.uint32))
        return m[0], m[1], m[2:4], m[4:6]

    def pairing_batch(self, g1_points, g2_points) -> List:
        """e(P_i, Q_i) for affine host point lists; returns host Fp12 list.

        Always final-exponentiated (the API hides the reference's FExp
        inconsistency between backends, SURVEY.md appendix)."""
        packed = self._encode_pairs(g1_points, g2_points)
        f = self._cached(
            "pairing",
            lambda a: self.pair.pairing(*self._pair_split_mont(a)),
        )
        return self.tw.f12_decode(f(packed))

    def pairing_product_is_one(self, g1_points, g2_points) -> bool:
        """prod_i e(P_i, Q_i) == 1, with one shared final exponentiation —
        the fast path for BLS/BBS+ style verification (cf. kilic
        engine.Check usage, perf_test.go:352-358).

        On BLS12 and BN curves under Mosaic the Miller loops + product
        run as ONE kernel dispatch (BN lanes include the Frobenius tail
        in-kernel) with the single-element final exp on the host C++
        engine; other configurations run the miller-batch + XLA product
        tree + final-exp pipeline."""
        packed = self._encode_pairs(g1_points, g2_points)
        if self.pair.supports_fused_product:
            # pad the lane axis to a power-of-two bucket so ONE compiled
            # program serves every batch size up to the bucket — the
            # kernel masks lanes >= n to the group identity, and the
            # Miller-product kernel's AOT compile is minutes-long.
            # Buckets below 1024 lanes compile with a SHORTER sublane
            # tile (pairing_pallas._tile_m): a 64-pair check then pays
            # for a (1, 128) tile per row op instead of (8, 128) — ~8x
            # less vector work at the same occupancy.
            n = packed.shape[-1]
            bucket = max(128, 1 << (n - 1).bit_length())
            padn = bucket - n
            if padn:
                packed = np.pad(packed, [(0, 0), (0, 0), (0, padn)])
            import os

            strat = os.environ.get("MATHLIB_PAIR_FUSED")
            if strat in ("check", "split") and self.pair.supports_fused_check:
                # all-device strategies (final exp + unity on chip);
                # the strategy is read at trace time inside product_check,
                # so it must be part of the jit cache key (env toggles
                # mid-process retrace instead of reusing the first trace)
                f = self._cached(
                    ("pair_check_fused", strat, bucket),
                    lambda a, nn: self.pair.product_check(
                        *self._pair_split_mont(a), nn
                    ),
                )
                return bool(np.asarray(f(packed, n)))
            # default: device Miller loops + product tree, then the SINGLE
            # Fp12 final exp + unity test on the host C++ engine — the
            # final exp of one element is a serial chain at 1/1024 lane
            # occupancy on the VPU (~40 ms); the C++ engine does it in
            # ~2.1 ms (ops/pairing.py product_miller).
            f = self._cached(
                ("pair_prod_fused", bucket),
                lambda a, nn: self.pair.product_miller(
                    *self._pair_split_mont(a), nn
                ),
            )
            return self._host_finish_product(f(packed, n))

        def check(a):
            xp, yp, qx, qy = self._pair_split_mont(a)
            f = self.pair.miller_loop(xp, yp, qx, qy)
            prod = f
            n = f.shape[-1]
            while n > 1:
                half = n // 2
                head = self.tw.f12_mul(
                    prod[..., 0 : 2 * half : 2], prod[..., 1 : 2 * half : 2]
                )
                if n % 2:
                    head = jnp.concatenate([head, prod[..., 2 * half :]], axis=-1)
                prod = head
                n = prod.shape[-1]
            return self.tw.f12_is_one(self.pair.final_exp(prod))

        f = self._cached("pair_check", check)
        return bool(np.asarray(f(packed))[0])

    def pairing_product_is_one_async(self, g1_points, g2_points):
        """Dispatch a product check NOW; return a zero-arg resolver.

        The synchronous check pays a full tunnel round trip (~29 ms
        measured round 5) per call; a serving loop that submits check
        i+1 before resolving check i overlaps the device kernel with the
        host fetch + final exp of the previous check.  On configurations
        without the fused kernel the work happens synchronously here and
        the resolver just returns the value."""
        packed = self._encode_pairs(g1_points, g2_points)
        if self.pair.supports_fused_product:
            n = packed.shape[-1]
            bucket = max(128, 1 << (n - 1).bit_length())
            padn = bucket - n
            if padn:
                packed = np.pad(packed, [(0, 0), (0, 0), (0, padn)])
            f = self._cached(
                ("pair_prod_fused", bucket),
                lambda a, nn: self.pair.product_miller(
                    *self._pair_split_mont(a), nn
                ),
            )
            dev = f(packed, n)  # async dispatch; no fetch yet
            try:
                # start the device->host copy NOW: the tunnel's fetch
                # round trip (~29 ms) then overlaps the caller's other
                # work instead of being paid inside the resolver
                dev.copy_to_host_async()
            except AttributeError:  # pragma: no cover - backend-dependent
                pass
            return lambda: self._host_finish_product(dev)
        val = self.pairing_product_is_one(g1_points, g2_points)
        return lambda: val

    def pairing_products_are_one(
        self, g1_points, g2_points, group_size: int
    ) -> List[bool]:
        """Many INDEPENDENT product checks in one dispatch: pairs are
        consecutive groups of ``group_size``; returns one verdict per
        group (prod_i e(P_i, Q_i) == 1 within each group).

        The serving form of ``pairing_product_is_one``: the per-call
        fixed cost (tunnel round trip ~23 ms measured round 5, encode,
        dispatch) amortizes over all groups.  BLS12 runs segmented
        Miller products + the batched device final-exp kernel + unity
        compare as ONE program and fetches G booleans; BN curves fetch
        the G unreduced products and finish each on the host C++ engine;
        other configurations fall back to per-group single checks."""
        n = len(g1_points)
        assert n == len(g2_points) and n % group_size == 0
        G = n // group_size
        pow2 = group_size & (group_size - 1) == 0
        if not (self.pair.supports_fused_product and pow2):
            return [
                self.pairing_product_is_one(
                    g1_points[k * group_size : (k + 1) * group_size],
                    g2_points[k * group_size : (k + 1) * group_size],
                )
                for k in range(G)
            ]
        packed = self._encode_pairs(g1_points, g2_points)
        # one compiled program per (group_size, bucket): lanes pad to a
        # power-of-two bucket, pad groups reduce to the identity
        bucket = max(128, 1 << (n - 1).bit_length())
        padn = bucket - n
        if padn:
            packed = np.pad(packed, [(0, 0), (0, 0), (0, padn)])
        # groups may not straddle grid tiles (seg <= ts*128): the tile is
        # 8 sublane rows above 1024 lanes, so group_size caps at 1024
        assert group_size <= 1024, (
            "groups over 1024 pairs: call pairing_product_is_one per check"
        )
        import os

        if (
            os.environ.get("MATHLIB_GROUP_FEXP") == "device"
            and self.pair.supports_fused_check
        ):
            # BLS12 alternative: segment products + batched device
            # final-exp kernel + unity test, one program, one G-bool
            # fetch.  Not the default: the narrow-tile final-exp kernel
            # variants compile pathologically slowly on the serving
            # stack, and the threaded host path below is within noise.
            f = self._cached(
                ("pair_products_dev", group_size, bucket),
                lambda a, nn: self.tw.f12_is_one(
                    self.tw.f12_final_exp(
                        self.pair.products_miller(
                            *self._pair_split_mont(a), group_size, nn
                        )
                    )
                ),
            )
            ok = np.asarray(f(packed, n))
            return [bool(v) for v in ok[:G]]
        # default: ONE device launch for all G segmented Miller products,
        # then G single-element final exps on the host C++ engine — in a
        # thread pool (ctypes releases the GIL; the engine context is
        # read-only after init), so 4 cores pipeline under device work
        f = self._cached(
            ("pair_products", group_size, bucket),
            lambda a, nn: self.pair.products_miller(
                *self._pair_split_mont(a), group_size, nn
            ),
        )
        vals = self.tw.f12_decode(np.asarray(f(packed, n)))[:G]
        if G >= 4:
            from concurrent.futures import ThreadPoolExecutor

            with ThreadPoolExecutor(max_workers=4) as pool:
                return list(
                    pool.map(
                        lambda v: bool(
                            self.host.gt_is_one(self.host.final_exp(v))
                        ),
                        vals,
                    )
                )
        return [
            bool(self.host.gt_is_one(self.host.final_exp(v))) for v in vals
        ]

    def _host_finish_product(self, prod) -> bool:
        """Finish a device (2, 3, 2, L, 1) unreduced Miller product: decode
        the single Fp12, final-exponentiate on the host engine, test unity."""
        val = self.tw.f12_decode(np.asarray(prod))[0]
        return bool(self.host.gt_is_one(self.host.final_exp(val)))

    # ------------------------------------------------------------- BLS ------
    def _device_hash_ctx(self):
        """Device hash-to-G1 context, or None if this curve is host-only
        (no SSWU isogeny data, or p % 4 != 3 — see ops/hash.py gate)."""
        try:
            from .ops.hash import get_hash_g1_ctx

            return get_hash_g1_ctx(self.spec)
        except ValueError:
            return None

    def hash_to_g1_batch(self, messages: Sequence[bytes], dst: bytes = b"") -> Array:
        """Messages -> (3, L, N) projective device points.

        Host does only expand_message_xmd; the SSWU map, isogeny, and
        cofactor clearing are one jitted device program (ops/hash.py)."""
        from .ops.hash import hash_to_g1_batch as device_hash

        return device_hash(self.spec, messages, dst)

    def hash_to_g1_bbs_batch(self, messages: Sequence[bytes], dst: bytes = b"") -> Array:
        """Messages -> (3, L, N) device points via the BBS+ legacy
        big-endian-sign SSWU (kilic/custom.go:134-237), fully on device
        apart from the BLAKE2b XMD bytes."""
        from .ops.hash import hash_to_g1_bbs_batch as device_hash

        return device_hash(self.spec, messages, dst)

    def bls_sign_batch(self, sk: int, messages: Sequence[bytes], dst: bytes = b"") -> List:
        """sig_i = [sk] H(m_i).

        On SSWU curves the hash runs on device (host keeps only the XMD
        bytes) and feeds the batched scalar-mul program directly; other
        curves fall back to the exact host hasher."""
        if self._device_hash_ctx() is not None:
            H = self.hash_to_g1_batch(messages, dst)
            S = self.g1.encode_scalars([sk] * len(messages))
            f = self._cached(
                "g1_smul_aff",
                lambda p, s: self.g1.to_affine_rows(self.g1.scalar_mul(p, s)),
            )
            return self.g1.decode_points_affine(f(H, jnp.asarray(S)))
        hasher = get_hasher(self.spec)
        pts = [hasher.hash_to_g1(m, dst) for m in messages]
        return self.g1_scalar_mul(pts, [sk] * len(pts))

    def bls_verify_batch(
        self, pk, signatures, messages: Sequence[bytes], dst: bytes = b""
    ) -> bool:
        """Verify all (sig_i, m_i) under G2 public key pk with one random
        linear combination + a single 2-pairing product check.

        On SSWU curves the hashes AND both weighted MSMs run on device
        (host keeps the XMD bytes and two final affine decodes); other
        curves use the exact host hasher."""
        import random as _random

        rng = _random.SystemRandom()
        weights = [rng.randrange(1, self.spec.r) for _ in signatures]
        if self._device_hash_ctx() is not None:
            H = self.hash_to_g1_batch(messages, dst)  # (3, L, N) device
            P = jnp.asarray(self.g1.encode_points(list(signatures)))
            W = jnp.asarray(self.g1.encode_scalars(weights))
            c, glv = self._msm_params(len(messages), None, None)
            f = self._cached(
                ("verify_msm2", c, glv),
                lambda h, p, w: self.g1.to_affine_rows(
                    jnp.concatenate(
                        [
                            msm(self.g1, p, w, c=c, glv=glv),
                            msm(self.g1, h, w, c=c, glv=glv),
                        ],
                        axis=-1,
                    )
                ),
            )
            Spt, Hpt = self.g1.decode_points_affine(f(H, P, W))
        else:
            hasher = get_hasher(self.spec)
            hs = [hasher.hash_to_g1(m, dst) for m in messages]
            Spt = self.g1_msm(list(signatures), weights, c=4)
            Hpt = self.g1_msm(hs, weights, c=4)
        if Spt is None or Hpt is None:
            return False
        neg_g2 = self.host.g2.neg(self.spec.g2_gen)
        return self.pairing_product_is_one([Spt, Hpt], [neg_g2, pk])


@lru_cache(maxsize=None)
def get_batch_engine(spec: CurveSpec) -> BatchEngine:
    return BatchEngine(spec)
