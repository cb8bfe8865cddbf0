"""Sharded wideband serving: channelizer + channel bank in ONE mesh
computation.

The channel bank already shards its station axis (parallel/channel.py);
this module puts the CHANNELIZER inside the same pjit so a single wideband
capture is decoded to S stations across the device mesh without leaving
the graph (SURVEY.md section 2.3 data-parallelism row: "64+ FM stations
... sharded"; VERDICT r3 next #4).

Sharding layout (station axis ``ch``):

- wideband i/q rails: replicated (every device reads the full capture —
  it is the SMALL array: n_wide vs S * n_wide / D of station output);
- mix-then-filter mode: per-station tone tables, mixed rails, decimator
  tails and basebands all shard on the station axis, so the big
  (2S, n_wide) intermediates never exist on any one device;
- folded-tone mode: the raw-rail history is tiny and replicated; the
  folded weight matrix columns (r-major, station-minor) and everything
  downstream of the matmul shard on stations via the constraint on the
  (S, n_out) basebands;
- receiver bank state/outputs: station axis sharded exactly as
  ChannelBank does.

XLA inserts no collectives in mix mode (the tone mix, FIR and receivers
are channel-local given a replicated input); fold mode's single shared
matmul partitions by output columns.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from real_time_sdr_tpu.models.channelizer import Channelizer, ChannelizerState
from real_time_sdr_tpu.models.receiver import Receiver


class ShardedWideband:
    """One wideband capture in, S sharded station decodes out."""

    def __init__(self, ch: Channelizer, rx: Receiver, mesh: Mesh,
                 axis: str = "ch"):
        assert len(ch.offsets) % mesh.shape[axis] == 0, (
            f"{len(ch.offsets)} stations do not tile the {axis} axis "
            f"({mesh.shape[axis]} shards)")
        self.ch = ch
        self.rx = rx
        self.mesh = mesh
        self.axis = axis
        # the Mosaic fold-epilogue kernel has no SPMD partitioning rule;
        # inside this pjit the XLA 4-D epilogue is used instead — it
        # partitions naturally on the station axis (same bytes to 1 u8
        # LSB, see ops/pallas/chan_epilogue.py)
        self.ch._fold_kernel = None
        self._sh_ch = NamedSharding(mesh, P(axis))
        self._sh_ch2 = NamedSharding(mesh, P(axis, None))
        self._sh_rep = NamedSharding(mesh, P())
        self._jit = jax.jit(self._step)

    # -- placement ---------------------------------------------------------

    def _chan_state_shardings(self):
        st = self.ch.init_state()
        if self.ch.fold and self.ch.tone_period:
            # raw-rail history (1, T-1) + scalars: replicate everything
            return jax.tree_util.tree_map(lambda _: self._sh_rep, st)
        return ChannelizerState(
            i_tails=self._sh_ch2, q_tails=self._sh_ch2,
            ph_re=self._sh_ch, ph_im=self._sh_ch, pos=self._sh_rep)

    def init_state(self):
        # build the states INSIDE a jit with out_shardings (instead of
        # device_put) so the same code works on a multi-process mesh, where
        # host arrays cannot be device_put across non-addressable devices
        cs = self.ch.init_state()
        bs = self.rx.init_state(batch=(len(self.ch.offsets),))
        sh = (self._chan_state_shardings(),
              jax.tree_util.tree_map(lambda _: self._sh_ch, bs))
        return jax.jit(lambda: (cs, bs), out_shardings=sh)()

    # -- the fused step ------------------------------------------------------

    def _step(self, cstate, bstate, i_wide, q_wide):
        if self.ch._fold_static:
            # fused epilogue: the (S, n_out) f32 rails never materialize;
            # the station shard constraint rides the u8 output (columns of
            # the fold matmul partition by station exactly as before)
            u8, cstate = self.ch.call_u8(i_wide, q_wide, cstate)
            u8 = jax.lax.with_sharding_constraint(u8, self._sh_ch2)
        else:
            (i_ds, q_ds), cstate = self.ch(i_wide, q_wide, cstate)
            i_ds = jax.lax.with_sharding_constraint(i_ds, self._sh_ch2)
            q_ds = jax.lax.with_sharding_constraint(q_ds, self._sh_ch2)
            u8 = jax.lax.with_sharding_constraint(
                self.ch.to_uint8(i_ds, q_ds), self._sh_ch2)
        bstate, out = jax.vmap(self.rx.run_segment)(bstate, u8)
        return cstate, bstate, out

    def replicate(self, arr: np.ndarray) -> jax.Array:
        """Host rail -> globally replicated device array (every process
        must pass identical data — the wideband capture is shared)."""
        arr = np.asarray(arr)
        return jax.make_array_from_callback(arr.shape, self._sh_rep,
                                            lambda idx: arr[idx])

    def step(self, cstate, bstate, i_wide, q_wide):
        """i_wide/q_wide: (n,) f32 wideband rails (host or replicated
        global arrays); returns (cstate, bstate, out) with every
        station-major leaf sharded."""
        if not (isinstance(i_wide, jax.Array)
                and i_wide.sharding == self._sh_rep):
            i_wide = self.replicate(i_wide)
        if not (isinstance(q_wide, jax.Array)
                and q_wide.sharding == self._sh_rep):
            q_wide = self.replicate(q_wide)
        return self._jit(cstate, bstate, i_wide, q_wide)
