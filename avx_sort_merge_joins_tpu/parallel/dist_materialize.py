"""Distributed materializing join: payload-carrying exchange + per-chip
<S-key, S-RID> output with physical dup-R expansion.

The reference's threads each materialize the matching S tuple per match
pair into chained buffers (reference: src/joins/joincommon.c:266-289 under
JOIN_MATERIALIZE) — with the duplicate nested loops emitting one output
tuple per (R, S) pair.  On TPU:

  partition  — range-bucketize local (key, payload) shards by destination
               chip (the same dest_of_keys range partition as dist_join),
  exchange   — all_to_all of padded key AND payload buckets over ICI
               (:mod:`.exchange` carries payloads natively),
  per chip   — sort received R keys and S tuples, compute per-S
               multiplicities via searchsorted ranks, compact matched S
               tuples, physically expand cntR>1 duplicates
               (ops.materialize.expand_matches),
  assemble   — host gathers per-chip padded outputs + counts and
               concatenates the live prefixes.

Chips own disjoint key ranges, so the concatenation is the exact multiset
of reference output tuples (the reference's own chained per-thread buffers
fix no global order either).

Pad hygiene: R pads (+2^31-1) and S pads (-2^31) can never match, so the
per-chip materialization runs over fully padded static shapes with no
valid-count plumbing.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..ops import materialize as mat
from . import exchange as ex
from .mesh import AXIS, make_mesh


def dist_join_materialize(rkeys, rpayloads, skeys, spayloads,
                          n_r: int, n_s: int,
                          mesh: Optional[Mesh] = None, slack: float = 2.0,
                          out_slack: float = 2.0):
    """Materialized distributed equi-join over a 1-D chip mesh.

    Returns ``(out_keys, out_payloads, count, overflow)``: host numpy
    columns of all matched <S-key, S-payload> tuples (one row per match
    pair, physical dup-R expansion), the match count (= len(out_keys)),
    and the exchange/output overflow (0 when slack sufficed; auto-retried
    with doubled slack otherwise).
    """
    mesh = mesh or make_mesh()
    n_chips = int(np.prod(list(mesh.shape.values())))
    shard_r = -(-n_r // n_chips)
    shard_s = -(-n_s // n_chips)
    cap_r = max(128, int(np.ceil(shard_r / n_chips * slack / 128)) * 128)
    cap_s = max(128, int(np.ceil(shard_s / n_chips * slack / 128)) * 128)
    # static per-chip output capacity: received-S capacity × expansion slack
    cap_out = max(128, int(np.ceil(n_chips * cap_s * out_slack / 128)) * 128)

    def pad_to(x, total, fill):
        x = jnp.asarray(x, jnp.int32)
        out = jnp.full((total,), fill, jnp.int32)
        return out.at[: x.shape[0]].set(x)

    rk = pad_to(rkeys[:n_r], shard_r * n_chips, ex.R_PAD_KEY)
    rp = pad_to(rpayloads[:n_r], shard_r * n_chips, 0)
    sk = pad_to(skeys[:n_s], shard_s * n_chips, ex.S_PAD_KEY)
    sp = pad_to(spayloads[:n_s], shard_s * n_chips, 0)
    nv_r = ex.valid_counts(n_r, shard_r, n_chips)
    nv_s = ex.valid_counts(n_s, shard_s, n_chips)

    def shard_fn(rk, rp, sk, sp, nvr, nvs):
        rk, rp, sk, sp = rk[0], rp[0], sk[0], sp[0]
        nr, ns = nvr[0], nvs[0]
        idx_r = jnp.arange(rk.shape[0], dtype=jnp.int32)
        idx_s = jnp.arange(sk.shape[0], dtype=jnp.int32)
        big = jnp.int32(2**31 - 1)
        live_r = idx_r < nr
        live_s = idx_s < ns
        lo = jnp.minimum(jnp.min(jnp.where(live_r, rk, big)),
                         jnp.min(jnp.where(live_s, sk, big)))
        hi = jnp.maximum(jnp.max(jnp.where(live_r, rk, -big)),
                         jnp.max(jnp.where(live_s, sk, -big)))
        lo = jax.lax.pmin(lo, AXIS)
        hi = jax.lax.pmax(hi, AXIS)
        dest_r = ex.dest_of_keys(rk, n_chips, lo, hi)
        dest_s = ex.dest_of_keys(sk, n_chips, lo, hi)
        brk, brp, rc, ovr = ex.bucketize_by(dest_r, rk, rp, nr, n_chips,
                                            cap_r, ex.R_PAD_KEY)
        bsk, bsp, sc, ovs = ex.bucketize_by(dest_s, sk, sp, ns, n_chips,
                                            cap_s, ex.S_PAD_KEY)
        grk, grp, _ = ex.exchange(brk, brp, rc, AXIS, n_chips, cap_r)
        gsk, gsp, _ = ex.exchange(bsk, bsp, sc, AXIS, n_chips, cap_s)
        # local sort + materialize over the fully padded shapes (pads
        # cannot match across R and S by sentinel construction)
        rks = jax.lax.sort((grk,), num_keys=1)[0]
        sks, sps = jax.lax.sort((gsk, gsp), num_keys=1)
        nmax = gsk.shape[0]
        ok, op, om, nm = mat.materialize_matches(rks, rks.shape[0],
                                                 sks, sps, nmax)
        ek, ep, total = mat.expand_matches(ok, op, om, nm, cap_out)
        out_ov = jnp.maximum(total - cap_out, 0)
        return (ek.reshape(1, -1), ep.reshape(1, -1),
                total.reshape(1), (ovr + ovs + out_ov).reshape(1))

    sharded = NamedSharding(mesh, P(AXIS))
    fn = jax.jit(shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(AXIS),) * 6,
        out_specs=(P(AXIS),) * 4,
    ))
    ek, ep, totals, overflow = fn(
        jax.device_put(rk.reshape(n_chips, shard_r), sharded),
        jax.device_put(rp.reshape(n_chips, shard_r), sharded),
        jax.device_put(sk.reshape(n_chips, shard_s), sharded),
        jax.device_put(sp.reshape(n_chips, shard_s), sharded),
        jax.device_put(jnp.asarray(nv_r), sharded),
        jax.device_put(jnp.asarray(nv_s), sharded),
    )
    ov = int(np.asarray(overflow).sum())
    if ov > 0 and slack < 16.0:
        return dist_join_materialize(rkeys, rpayloads, skeys, spayloads,
                                     n_r, n_s, mesh, slack * 2,
                                     out_slack * 2)
    ek = np.asarray(ek)
    ep = np.asarray(ep)
    totals = np.asarray(totals)
    ks = np.concatenate([ek[c, : totals[c]] for c in range(n_chips)])
    ps = np.concatenate([ep[c, : totals[c]] for c in range(n_chips)])
    return ks, ps, int(totals.sum()), ov
