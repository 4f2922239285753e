"""Radix-2 evaluation domains with device NTT/iNTT.

Replaces the arkworks `GeneralEvaluationDomain` usage of the reference
(plonk/src/circuit.rs:166-197, plonk/src/prover.rs:374-375,
fri/src/fri_layer.rs:36-56) with a TPU-resident iterative Cooley-Tukey
transform over limb-decomposed Montgomery field vectors.

Conventions match arkworks Radix2EvaluationDomain so values agree
element-for-element:
  - size = next_power_of_two(requested)
  - group_gen ω = TWO_ADIC_ROOT_OF_UNITY^(2^(two_adicity - log2 n))
  - fft: coefficients -> [p(ω^0), ..., p(ω^{n-1})] in natural order
  - ifft includes the 1/n scaling
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..config import HOST_NTT_MAX
from ..fields.host import FieldSpec
from ..fields.fp import DeviceField, device_field, ints_to_digits


# Below this size, power tables are built with host bignum loops (cheap) to
# avoid device compiles for tiny domains; above it, log-depth device cumprods.
_HOST_TWIDDLE_MAX = 1 << 12


def _bit_reverse_perm(n: int) -> np.ndarray:
    log_n = n.bit_length() - 1
    idx = np.arange(n, dtype=np.uint32)
    rev = np.zeros(n, dtype=np.uint32)
    for b in range(log_n):
        rev |= ((idx >> b) & 1) << (log_n - 1 - b)
    return rev


class Radix2Domain:
    def __init__(self, spec: FieldSpec, size: int):
        assert size >= 1
        n = 1 << (size - 1).bit_length() if size > 1 else 1
        log_n = n.bit_length() - 1
        if log_n > spec.two_adicity:
            raise ValueError(f"domain size 2^{log_n} unsupported for {spec.name}")
        self.spec = spec
        self.df: DeviceField = device_field(spec)
        self.size = n
        self.log_n = log_n
        self.group_gen = spec.root_of_unity(n)
        self.group_gen_inv = spec.inv(self.group_gen) if n > 1 else 1
        self.size_inv = spec.inv(n)
        self._perm = _bit_reverse_perm(n)
        self._fwd_tw = self._twiddle_stack(self.group_gen)
        self._inv_tw = self._twiddle_stack(self.group_gen_inv)
        # Twiddles and the permutation are passed as ARGUMENTS, not read from
        # self inside the traced body: jit-closure arrays are embedded as HLO
        # constants, and at a 2^22 domain the serialized program (~300 MB of
        # twiddle literals) exceeds the remote-compile tunnel's upload limit
        # (HTTP 413).  As parameters they ship once as device buffers.
        self._perm_dev = jnp.asarray(self._perm)
        self._fft_jit = jax.jit(functools.partial(self._transform, inverse=False))
        self._ifft_jit = jax.jit(functools.partial(self._transform, inverse=True))

    # -- host helpers --

    def element(self, i: int) -> int:
        return self.spec.pow(self.group_gen, i % self.size)

    def elements_ints(self) -> list[int]:
        out, cur = [], 1
        for _ in range(self.size):
            out.append(cur)
            cur = self.spec.mul(cur, self.group_gen)
        return out

    def elements_device(self) -> jnp.ndarray:
        """ω^i for i < n as a Montgomery digit array (computed via scan)."""
        if getattr(self, "_elements_cache", None) is None:
            self._elements_cache = self.df.powers(self.group_gen, self.size)
        return self._elements_cache

    def evaluate_vanishing(self, z: int) -> int:
        return (self.spec.pow(z, self.size) - 1) % self.spec.modulus

    def _twiddle_stack(self, gen: int):
        """Per-stage twiddle tables for the iterative DIT butterfly.

        Stage s needs [w_m^j for j < m/2] with w_m = gen^(n/m); every entry
        is a strided slice of E = [gen^j for j < n/2], so one table covers
        all stages.  Small domains build E with a host loop (latency tier);
        large domains use one log-depth device cumprod instead of O(n) host
        bignum multiplications.
        """
        spec = self.spec
        half = max(self.size // 2, 1)
        if self.size <= _HOST_TWIDDLE_MAX:
            cur, vals = 1, []
            for _ in range(half):
                vals.append(spec.to_mont(cur))
                cur = spec.mul(cur, gen)
            E = jnp.asarray(ints_to_digits(vals, spec.num_digits), dtype=jnp.uint32)
        else:
            E = self.df.powers(gen, half)
        # Return E itself; _transform slices the per-stage tables inside the
        # traced body.  Materializing all log_n stage tables here would hold
        # ~2x E of extra HBM at rest PER DIRECTION (and the 16-digit minor
        # dim is lane-padded 8x, so that is ~4 GB at a 2^22 domain).
        return E

    # -- device transforms --

    def _transform(self, values: jnp.ndarray, perm: jnp.ndarray, E: jnp.ndarray, inverse: bool) -> jnp.ndarray:
        df = self.df
        n = self.size
        assert values.shape[-2] == n, (values.shape, n)
        x = values[..., perm, :]
        for s in range(1, self.log_n + 1):
            m = 1 << s
            half = m // 2
            stride = n // m
            table = E[::stride][:half]  # stage twiddles, sliced in-graph
            lead = x.shape[:-2]
            xr = x.reshape(lead + (n // m, m, df.num_digits))
            even = xr[..., :half, :]
            odd = xr[..., half:, :]
            t = df.mont_mul(odd, table)
            x = jnp.concatenate([df.add(even, t), df.sub(even, t)], axis=-2)
            x = x.reshape(lead + (n, df.num_digits))
        if inverse:
            n_inv = jnp.asarray(
                ints_to_digits([self.spec.to_mont(self.size_inv)], df.num_digits)[0]
            )
            x = df.mont_mul(x, n_inv)
        return x

    # -- host transform (small sizes: latency-bound, see zktpu/config.py) --

    def _host_transform(self, values: list[int], inverse: bool) -> list[int]:
        """Same bit-reverse + DIT butterflies over python ints."""
        spec = self.spec
        n = self.size
        x = [values[int(self._perm[i])] for i in range(n)]
        gen = self.group_gen_inv if inverse else self.group_gen
        for s in range(1, self.log_n + 1):
            m = 1 << s
            w_m = spec.pow(gen, n // m)
            for k in range(0, n, m):
                w = 1
                for j in range(m // 2):
                    t = spec.mul(w, x[k + j + m // 2])
                    u = x[k + j]
                    x[k + j] = spec.add(u, t)
                    x[k + j + m // 2] = spec.sub(u, t)
                    w = spec.mul(w, w_m)
        if inverse:
            x = [spec.mul(v, self.size_inv) for v in x]
        return x

    def _transform_tiered(self, arr: jnp.ndarray, inverse: bool) -> jnp.ndarray:
        if self.size <= HOST_NTT_MAX and arr.ndim == 2:
            vals = self.df.decode_ints(arr)
            out = self._host_transform(vals, inverse)
            return self.df.encode_ints(out)
        return self._run_device(arr, inverse)

    def _run_device(self, arr: jnp.ndarray, inverse: bool) -> jnp.ndarray:
        E = self._inv_tw if inverse else self._fwd_tw
        fn = self._ifft_jit if inverse else self._fft_jit
        return fn(arr, self._perm_dev, E)

    def transform_inline(self, values: jnp.ndarray, inverse: bool) -> jnp.ndarray:
        """Trace the butterfly network into an ENCLOSING jit/shard_map region
        (twiddles as closure constants — fine for the small per-axis domains
        of the four-step NTT, wrong for huge standalone transforms: use
        fft/ifft, which ship twiddles as parameters)."""
        E = self._inv_tw if inverse else self._fwd_tw
        return self._transform(values, self._perm_dev, E, inverse=inverse)

    def fft(self, coeffs: jnp.ndarray, force_device: bool = False) -> jnp.ndarray:
        """coeffs: (..., m, D) with m <= n; zero-padded to n automatically."""
        coeffs = self._pad(coeffs)
        if self.size == 1:
            return coeffs
        if force_device:
            return self._run_device(coeffs, inverse=False)
        return self._transform_tiered(coeffs, inverse=False)

    def ifft(self, evals: jnp.ndarray, force_device: bool = False) -> jnp.ndarray:
        assert evals.shape[-2] == self.size
        if self.size == 1:
            return evals
        if force_device:
            return self._run_device(evals, inverse=True)
        return self._transform_tiered(evals, inverse=True)

    def _pad(self, coeffs: jnp.ndarray) -> jnp.ndarray:
        m = coeffs.shape[-2]
        if m == self.size:
            return coeffs
        assert m < self.size
        pad = [(0, 0)] * coeffs.ndim
        pad[-2] = (0, self.size - m)
        return jnp.pad(coeffs, pad)

    # -- coset transforms (offset g): evaluate/interpolate on g * <ω> --

    @functools.lru_cache(maxsize=8)
    def _offset_powers(self, offset: int) -> jnp.ndarray:
        spec = self.spec
        if self.size <= _HOST_TWIDDLE_MAX:
            vals, cur = [], 1
            for _ in range(self.size):
                vals.append(spec.to_mont(cur))
                cur = spec.mul(cur, offset)
            return jnp.asarray(ints_to_digits(vals, spec.num_digits))
        return self.df.powers(offset, self.size)

    def coset_fft(self, coeffs: jnp.ndarray, offset: int) -> jnp.ndarray:
        coeffs = self._pad(coeffs)
        scaled = self.df.mont_mul(coeffs, self._offset_powers(offset))
        return self.fft(scaled)

    def coset_ifft(self, evals: jnp.ndarray, offset: int) -> jnp.ndarray:
        coeffs = self.ifft(evals)
        inv_off = self.spec.inv(offset)
        return self.df.mont_mul(coeffs, self._offset_powers(inv_off))


@functools.lru_cache(maxsize=None)
def get_domain(spec: FieldSpec, size: int) -> Radix2Domain:
    return Radix2Domain(spec, size)
