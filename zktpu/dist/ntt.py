"""Four-step (Bailey) NTT sharded over a device mesh.

Replaces the single-chip iterative transform (zktpu/poly/domain.py) at scales
where the evaluation domain is sharded across chips.  Decomposition for
n = R*C, input x[j1*C + j2] viewed as an (R, C) matrix:

  1. length-R NTT down each column           (j1 -> k1)
  2. twiddle multiply by w_n^(k1*j2)
  3. length-C NTT along each row             (j2 -> k2)
  4. output X[k1 + R*k2]  (transpose read-out)

With rows sharded, steps 1 and 3 are purely local transforms; the only
cross-chip traffic is the three all_to_all transposes (SURVEY.md §2.C:
"butterfly stages local until stride exceeds shard; one transpose mid-
transform").  Local transforms reuse the Radix2Domain twiddle tables, so
results agree element-for-element with the arkworks-convention single-chip
transform (same root of unity g^((p-1)/n)).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P
shard_map = jax.shard_map

from ..fields.host import FieldSpec
from ..fields.fp import device_field
from ..poly.domain import get_domain


class FourStepNTT:
    def __init__(self, spec: FieldSpec, size: int, mesh, axis_name: str = "shard"):
        assert size & (size - 1) == 0 and size > 1
        self.spec = spec
        self.df = device_field(spec)
        self.size = size
        self.mesh = mesh
        self.axis_name = axis_name
        self.ndev = mesh.devices.size
        log_n = size.bit_length() - 1
        self.R = 1 << (log_n // 2)
        self.C = size // self.R
        if self.R % self.ndev or self.C % self.ndev:
            raise ValueError(
                f"four-step NTT needs ndev | R and ndev | C (n={size}, ndev={self.ndev})"
            )
        self.dom_r = get_domain(spec, self.R)
        self.dom_c = get_domain(spec, self.C)
        self.omega_n = spec.root_of_unity(size)
        self._fwd = self._build(inverse=False)
        self._inv = self._build(inverse=True)

    # -- twiddle table W[k1, j2] = w^(k1*j2), (R, C, D) Montgomery digits --

    @functools.lru_cache(maxsize=2)
    def _twiddles(self, inverse: bool) -> jnp.ndarray:
        df, spec = self.df, self.spec
        w = spec.inv(self.omega_n) if inverse else self.omega_n
        # A[k1] = w^k1 via log-depth cumprod
        g = df.encode_int(w)
        col = jnp.broadcast_to(g, (self.R, df.num_digits))
        col = jnp.concatenate([jnp.asarray(df.one_np)[None], col[:-1]], axis=0)
        A = df.cumprod(col, axis=0)  # (R, D)
        # W[k1, :] = cumprod over j2 of [1, A[k1], A[k1], ...]
        one = jnp.broadcast_to(jnp.asarray(df.one_np), (self.R, 1, df.num_digits))
        rows = jnp.broadcast_to(A[:, None, :], (self.R, self.C - 1, df.num_digits))
        M = jnp.concatenate([one, rows], axis=1)
        return df.cumprod(M, axis=1)  # (R, C, D)

    def _build(self, inverse: bool):
        df = self.df
        ndev, R, C = self.ndev, self.R, self.C
        ax = self.axis_name
        dom_r, dom_c = self.dom_r, self.dom_c
        # no extra 1/n factor: the two local inverse transforms already scale
        # by 1/R and 1/C, whose product is 1/n.

        def local(x, W):
            # x: (R/ndev, C, D) rows-sharded; W: (R, C/ndev, D) cols-sharded
            x = jax.lax.all_to_all(x, ax, split_axis=1, concat_axis=0, tiled=True)
            # (R, C/ndev, D): column NTTs (length R along axis 0)
            x = jnp.swapaxes(x, 0, 1)  # (C/ndev, R, D)
            x = dom_r.transform_inline(x, inverse=inverse)
            x = jnp.swapaxes(x, 0, 1)  # (R, C/ndev, D)
            x = df.mont_mul(x, W)
            # reshard rows (k1) across devices for the row NTTs
            x = jax.lax.all_to_all(x, ax, split_axis=0, concat_axis=1, tiled=True)
            # (R/ndev, C, D): row NTTs (length C along axis 1)
            x = dom_c.transform_inline(x, inverse=inverse)
            # output ordering X[k1 + R*k2]: shard k2, transpose locally
            x = jax.lax.all_to_all(x, ax, split_axis=1, concat_axis=0, tiled=True)
            # (R, C/ndev, D) indexed [k1, k2_local]
            x = jnp.swapaxes(x, 0, 1)  # (C/ndev, R, D)
            x = x.reshape(-1, x.shape[-1])  # (n/ndev, D)
            return x

        fn = shard_map(
            local,
            mesh=self.mesh,
            in_specs=(P(ax, None, None), P(None, ax, None)),
            out_specs=P(ax, None),
            check_vma=False,  # pallas kernels inside carry no varying-axes types
        )

        def run(flat):
            # flat: (n, D) natural order, sharded (or shardable) on axis 0
            x = flat.reshape(R, C, df.num_digits)
            return fn(x, self._twiddles(inverse)).reshape(self.size, df.num_digits)

        return jax.jit(run)

    def fft(self, coeffs: jnp.ndarray) -> jnp.ndarray:
        """(n, D) coefficients -> (n, D) evaluations, natural order."""
        return self._fwd(coeffs)

    def ifft(self, evals: jnp.ndarray) -> jnp.ndarray:
        return self._inv(evals)


@functools.lru_cache(maxsize=None)
def get_four_step(spec: FieldSpec, size: int, mesh, axis_name: str = "shard") -> FourStepNTT:
    return FourStepNTT(spec, size, mesh, axis_name)
