"""Multi-stream serving: a fixed-lane pool with per-lane lifecycle.

``StreamPool`` is the production-serving layer above
:class:`~samplernn_pase_tpu.generate.StreamingGenerator`: one resident
batch of ``n_lanes`` decode lanes advancing in lock-step (one device
dispatch per chunk for ALL lanes — the TPU form of continuous
batching: static shapes, recycled slots), where individual TTS streams
join and leave at chunk boundaries without stopping the batch.

Why this shape: every batch lane is independent in the model (per-lane
RNN state, per-lane MLP), so a pool lane's stream is IDENTICAL to a
solo b=1 generator given the same conditioning — equality-tested in
``tests/test_serve.py`` — while the chip amortizes the weight traffic
across all lanes (b=128 batch decode measures ~750x realtime vs
~1.8x for b=1 through this box's tunnel; see docs/PERF.md). A slot that is not serving a request still
computes (garbage that nobody reads); that is inherent to static-shape
batching and is exactly the trade continuous-batching servers make.

Per-lane conditioning: every lane's stream lives DEVICE-resident
(uploaded once at ``start()``, padded to the pool's frame cap by
repeating its last row — exactly the clamp-past-end semantics, with
the speaker embedding folded in once for speaker models), and each
emit hands the whole buffer plus the per-lane sample cursors to the
decode; the kernel resolves each lane's own row alignment from its
cursor phase (``generate.py:_megagen_chunk`` / ``megagen.py`` two-row
select), so chunks only need to be multiples of ``lookback`` — a
conditioned flagship pool serves 1024-sample (64 ms) chunks, the same
floor as unconditioned lanes. The steady-state emit path touches the
host only to dispatch — on a remote-attached host, serving latency is
round-trip-bound, not compute-bound (docs/PERF.md pool table).

JAX's functional arrays make the lifecycle race-free for enqueue-ahead
serving loops: ``start()``/``stop()`` build NEW state arrays, so chunks
already enqueued keep the state they were dispatched with — a join can
never corrupt audio another lane has in flight.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from . import generate as gen
from .config import SampleRNNConfig
from .models import samplernn
from .ops.mulaw import quantize_zero


@functools.partial(jax.jit, static_argnames=("cfg",))
def _pool_join(params, states, hist, la, lane_keys, noise_pos,
               stream_key, key_epoch, cursors, cond_buf, cond_dev,
               spk, *, cfg):
    """Every pool-array update of one join as ONE compiled program.

    Run eagerly these are 7-9 separate dispatches per join (state
    reset, history, key, noise position, cursor, conditioning scatter
    + speaker fold, speaker id) — on a remote-attached host each costs
    a round trip, which is why PERF.md's worst-case chunks correlated
    with mid-run joins.  The lane index, stream key, claim epoch and
    speaker id ride as traced operands, so every join on any lane
    shares this one executable (per cond-capacity bucket).

    ``stream_key``/``key_epoch``/``cond_dev``/``spk`` are None for the
    variants that don't apply (greedy pool, caller-pinned key,
    unconditioned, speakerless) — None is pytree structure, so each
    variant is its own cached executable with the same math as the old
    eager path (bit-exactness is pinned by the pool==solo tests).
    """
    b = hist.shape[0]
    resets = (jnp.arange(b) == la).astype(jnp.float32)
    states = samplernn.reset_state(params, cfg, states, resets)
    hist = hist.at[la].set(quantize_zero(cfg.q_levels))
    skey = stream_key
    if skey is None and key_epoch is not None:
        pool_key, epoch = key_epoch
        skey = jax.random.fold_in(jax.random.fold_in(pool_key, la), epoch)
    if skey is not None:
        lane_keys = lane_keys.at[la].set(skey)
        noise_pos = noise_pos.at[la].set(0)
    if cond_dev is not None:
        if spk is not None:
            # fold the speaker embedding in ONCE (solo folds it per
            # emit; add-then-gather == gather-then-add, so the lane
            # stays bit-identical to its solo generator). A speaker
            # model always has a cond buffer: init_params enforces
            # n_speakers => cond_dim, so this is the only speaker path.
            cond_dev = cond_dev + jnp.take(params["speaker"], spk, axis=0)
        cond_buf = cond_buf.at[la].set(cond_dev)
        cursors = cursors.at[la].set(0)
    return (states, hist, lane_keys, noise_pos, cursors, cond_buf)


@jax.jit
def _advance(cursors, noise_pos, n):
    """Advance both per-lane counters in ONE dispatch — the sampled
    conditioned emit path would otherwise pay two eager-op round trips
    per chunk on a remote-attached host (the same accounting that
    motivated the fused _pool_join)."""
    return cursors + n, noise_pos + n


@jax.jit
def _pool_extend(params, cond_buf, la, ln, rows_dev, spk):
    """extend_cond's lane rewrite as ONE compiled program: append
    ``rows_dev`` ([kb, D], last-row-padded to its power-of-two bucket)
    at row ``ln`` and re-clamp the tail, all traced (one executable per
    row-count bucket; ``spk`` is None for speakerless models)."""
    if spk is not None:
        rows_dev = rows_dev + jnp.take(params["speaker"], spk, axis=0)
    kb = rows_dev.shape[0]
    posi = jnp.arange(cond_buf.shape[1])
    gathered = jnp.take(rows_dev, jnp.clip(posi - ln, 0, kb - 1),
                        axis=0)                          # [F, D]
    lanebuf = jnp.where((posi >= ln)[:, None], gathered, cond_buf[la])
    return cond_buf.at[la].set(lanebuf)


def _scatter_lane(pool_tree, one_tree, lane):
    """Write a batch=1 state pytree into one lane of a pooled pytree.

    State leaves are [n_rnn, (2,)? B, H] (batch axis -2); the b=1 leaf
    collapses to the same shape with B=1. ``lane`` should be a traced
    device scalar so scatters on different lanes share one executable.
    """
    return tuple(
        jax.tree.map(
            lambda p, o: jax.lax.dynamic_update_index_in_dim(
                p, jnp.squeeze(o, axis=-2).astype(p.dtype), lane, -2),
            p_t, o_t)
        for p_t, o_t in zip(pool_tree, one_tree))


class StreamPool:
    """``n_lanes`` independent audio streams, one device call per chunk.

    >>> pool = StreamPool(params, cfg, n_lanes=8, temperature=0.95)
    >>> a = pool.start(cond=emb_a, speaker=3)       # claims a free lane
    >>> b = pool.start(cond=emb_b, speaker=1)
    >>> chunk = pool.emit(1280)                     # [8, 1280] async
    >>> audio_a = np.asarray(chunk[a])              # lane a's samples
    >>> pool.stop(a)                                # slot reusable

    ``emit`` returns the WHOLE batch as an async device array; the
    serving layer slices the lanes it owns (materializing per lane).

    Sampling is per-lane: each stream gets its own noise key at
    ``start()`` — caller-pinned via ``start(stream_key=...)`` or
    derived as fold_in(fold_in(pool_key, lane), lane_epoch), where
    lane_epoch counts THIS lane's claims — and its noise at local
    sample position p is gumbel(fold_in(stream_key, p)). A lane's
    sampled stream is therefore a pure function of its own start:
    invariant to when other streams join or leave, and bit-equal to a
    solo ``StreamingGenerator(stream_keys=...)`` with the same key
    (greedy lanes are reproducible as before).
    """

    def __init__(self, params, cfg: SampleRNNConfig, n_lanes: int,
                 temperature: float | None = 1.0, key=None,
                 use_pallas: bool | str | None = None,
                 max_cond_frames: int = 1024, mesh=None):
        if n_lanes < 1:
            raise ValueError("n_lanes must be >= 1")
        if mesh is not None and n_lanes % mesh.shape["data"]:
            raise ValueError(
                f"n_lanes={n_lanes} must divide over the mesh data "
                f"axis ({mesh.shape['data']})")
        self.mesh = mesh
        self.params, self.cfg, self.n = params, cfg, int(n_lanes)
        self.temperature = temperature
        self.key = key if key is not None else jax.random.PRNGKey(0)
        self.use_pallas = use_pallas
        # per-lane noise streams (generate_levels lane_keys): key set at
        # start(), position zeroed there and advanced per emit — a
        # lane's sampled output never depends on the other lanes
        self._lane_keys = jnp.zeros((self.n, 2), jnp.uint32)
        self._noise_pos = jnp.zeros((self.n,), jnp.int32)
        self._epochs = [0] * self.n         # claims of each lane so far
        self.states = samplernn.initial_state(params, cfg, self.n)
        self.hist = jnp.full((self.n, cfg.lookback),
                             quantize_zero(cfg.q_levels), jnp.int32)
        self._free = list(range(self.n - 1, -1, -1))   # pop() -> lane 0 first
        self.active: set[int] = set()
        # DEVICE-resident per-lane conditioning: each lane's stream is
        # uploaded ONCE at start() (padded to max_cond_frames by
        # repeating its last row — identical to clamp-past-end; speaker
        # embedding folded in, matching solo's speaker_cond add) and
        # every emit passes the whole buffer with the per-lane SAMPLE
        # cursors — the decode gathers each lane's rows at its own
        # offset on device. Serving latency through a remote-attached
        # host is round-trip-bound, so the steady-state emit must touch
        # the host only to dispatch — re-uploading assembled rows each
        # chunk measured ~35% slower at n_lanes=128 (docs/PERF.md pool
        # table). HBM cost: n_lanes x max_cond_frames x cond_dim x 4 B.
        self._f_cap = int(max_cond_frames)
        self._cond_buf = (jnp.zeros((self.n, self._f_cap, cfg.cond_dim),
                                    jnp.float32)
                          if cfg.cond_dim else None)
        self._cond_len = [0] * self.n       # unpadded rows per lane
        self._cursors = jnp.zeros((self.n,), jnp.int32)   # in SAMPLES
        # host mirror of each lane's speaker id (prime() and
        # extend_cond() need the scalar; the embedding itself is folded
        # into the cond buffer at start() — init_params enforces
        # n_speakers => cond_dim, so there is no cond-less speaker path)
        self._speakers = (np.zeros((self.n,), np.int32)
                          if cfg.n_speakers else None)
        if mesh is not None:
            # multi-chip serving: lanes shard over the mesh 'data' axis
            # (every lane is independent, so the decode graph needs no
            # collectives — XLA just partitions the batch dim); params
            # replicate (or column-shard on an optional 'model' axis)
            from samplernn_pase_tpu.parallel import mesh as pm
            self.params = jax.device_put(params,
                                         pm.shard_params(params, mesh))
            self._commit_sharded()

    def _commit_sharded(self):
        """(Re-)place every lane-carrying array with its mesh sharding.
        Called after lifecycle mutations: the join/extend jits (and the
        seeded path's eager scatters) can leave unspecified output
        shardings, and the emit jit should always see the canonical
        layout."""
        from samplernn_pase_tpu.parallel import mesh as pm
        mesh = self.mesh
        self.states = tuple(
            jax.tree.map(lambda l: jax.device_put(
                l, pm.state_sharding(mesh, l.ndim)), t)
            for t in self.states)
        self.hist = jax.device_put(self.hist, pm.batch_sharding(mesh, 2))
        self._cursors = jax.device_put(self._cursors,
                                       pm.batch_sharding(mesh, 1))
        self._lane_keys = jax.device_put(self._lane_keys,
                                         pm.batch_sharding(mesh, 2))
        self._noise_pos = jax.device_put(self._noise_pos,
                                         pm.batch_sharding(mesh, 1))
        if self._cond_buf is not None:
            self._cond_buf = jax.device_put(self._cond_buf,
                                            pm.batch_sharding(mesh, 3))

    # -- lifecycle -------------------------------------------------------
    def start(self, cond=None, speaker=None, seed_levels=None,
              seed_cond=None, lane: int | None = None,
              stream_key=None) -> int:
        """Claim a lane for a new stream and return its index.

        cond: [frames, cond_dim] conditioning stream for this utterance
        (required iff the model has cond_dim). speaker: int id
        (required iff the model has n_speakers). seed_levels: optional
        [L] or [1, L] int32 prompt — the lane continues this audio
        (states warmed via :func:`~samplernn_pase_tpu.generate.prime`,
        with seed_cond rows covering the seed if conditioned).
        stream_key: optional PRNG key pinning this stream's sampling
        noise (default: derived from the pool key, the lane index and
        the lane's claim count) — a solo
        ``StreamingGenerator(stream_keys=stream_key)`` reproduces the
        lane's sampled output bit-for-bit.
        """
        # validate EVERYTHING before claiming the lane — a rejected
        # start must not leak the slot
        if lane is None:
            if not self._free:
                raise RuntimeError(
                    f"pool exhausted: all {self.n} lanes active")
        elif lane in self.active:
            raise ValueError(f"lane {lane} is already active")
        elif lane not in self._free:
            raise ValueError(f"lane {lane} out of range [0, {self.n})")
        if self.cfg.cond_dim:
            if cond is None:
                raise ValueError(
                    "model has cond_dim: start(cond=...) is required")
            cond = np.asarray(cond, np.float32)
            if cond.ndim != 2 or cond.shape[0] == 0 \
                    or cond.shape[1] != self.cfg.cond_dim:
                raise ValueError(
                    f"cond must be [frames, {self.cfg.cond_dim}], "
                    f"got {cond.shape}")
            # streams longer than max_cond_frames grow the buffer
            # (_ensure_cap below) rather than rejecting the start
        elif cond is not None:
            raise ValueError("cond passed to an unconditioned model")
        if self.cfg.n_speakers:
            if speaker is None:
                raise ValueError(
                    "model has n_speakers: start(speaker=...) is required")
            if not 0 <= int(speaker) < self.cfg.n_speakers:
                raise ValueError(f"speaker {speaker} out of range "
                                 f"[0, {self.cfg.n_speakers})")
        if stream_key is not None:
            if self.temperature is None:
                # silently discarding the key would break the
                # documented contract that it pins this stream's
                # sampling noise — a greedy pool has none
                raise ValueError(
                    "stream_key passed to a greedy pool "
                    "(temperature=None): there is no sampling noise "
                    "to pin")
            stream_key = np.asarray(stream_key, np.uint32)
            if stream_key.shape != (2,):
                raise ValueError(
                    "stream_key must be a raw [2]-uint32 PRNG key "
                    f"(jax.random.PRNGKey(...)), got {stream_key.shape}")
        seed = None
        sc = None
        if seed_cond is not None and seed_levels is None:
            # silently dropping the rows would leave the lane decoding
            # from its cond stream while the caller believes the prompt
            # context covered them
            raise ValueError(
                "seed_cond passed without seed_levels: the rows cover a "
                "prompt, and there is none")
        if seed_levels is not None:
            seed = jnp.asarray(seed_levels, jnp.int32)
            if seed.ndim == 1:
                seed = seed[None]
            if seed.ndim != 2 or seed.shape[0] != 1:
                raise ValueError("seed_levels must be one lane: [L] or "
                                 f"[1, L], got {np.shape(seed_levels)}")
            if seed_cond is not None:
                sc = np.asarray(seed_cond, np.float32)
                if sc.ndim != 2 or sc.shape[1] != self.cfg.cond_dim:
                    raise ValueError(
                        f"seed_cond must be [frames, {self.cfg.cond_dim}]"
                        f", got {sc.shape}")
                sc = sc[None]
        # claim + commit (nothing below raises). The lane index becomes
        # a TRACED device scalar for every array update: a python int
        # would be baked into each eager program as a constant, so a
        # pool that joins on many different lanes would compile one
        # tiny program PER LANE INDEX -- measured as multi-second worst
        # chunks at n_lanes=128. With a traced index every join on any
        # lane reuses the same cached executables.
        lane = self._free.pop() if lane is None else (
            self._free.remove(lane) or lane)
        la = jnp.int32(lane)
        # the lane's noise stream: pure function of its key and its
        # local position from here on (the default derives by lane and
        # claim-epoch, keeping keys distinct AND invariant to what the
        # other lanes ever did — derived inside the join jit)
        skey = key_epoch = None
        if self.temperature is not None:
            if stream_key is not None:
                skey = jnp.asarray(stream_key)
            else:
                key_epoch = (self.key, jnp.int32(self._epochs[lane]))
        self._epochs[lane] += 1
        cond_dev = spk_dev = None
        if self.cfg.cond_dim:
            # pad to the frame cap by repeating the last row — the one
            # clamp-extend definition (gen.fit_cond_stream); the join
            # jit folds the speaker embedding in once on device
            self._ensure_cap(cond.shape[0])
            self._cond_len[lane] = cond.shape[0]
            cond_dev = jnp.asarray(gen.fit_cond_stream(cond, self._f_cap))
        if self.cfg.n_speakers:
            self._speakers[lane] = int(speaker)
            spk_dev = jnp.int32(speaker)
        # fresh per-lane state (learned h0 + q_zero history) + all the
        # lane-array writes in ONE dispatch (_pool_join)
        (self.states, self.hist, self._lane_keys, self._noise_pos,
         self._cursors, self._cond_buf) = _pool_join(
            self.params, self.states, self.hist, la, self._lane_keys,
            self._noise_pos, skey, key_epoch, self._cursors,
            self._cond_buf, cond_dev, spk_dev, cfg=self.cfg)
        if seed is not None:
            spk1 = (np.asarray([self._speakers[lane]], np.int32)
                    if self._speakers is not None else None)
            try:
                s1, h1 = gen.prime(self.params, self.cfg, seed, cond=sc,
                                   speakers=spk1)
            except Exception:
                # never leak the claimed slot: the lane's state was
                # already reset above, so returning it to the free list
                # is safe — but the join dispatch already ran, so a
                # mesh pool must still recommit canonical shardings for
                # the surviving lanes' emits
                self._free.append(lane)
                if self.mesh is not None:
                    self._commit_sharded()
                raise
            self.states = _scatter_lane(self.states, s1, la)
            self.hist = self.hist.at[la].set(h1[0])
        if self.mesh is not None:
            self._commit_sharded()
        self.active.add(lane)
        return lane

    def _ensure_cap(self, frames: int):
        """Grow the device-resident cond buffer (doubling) to hold
        ``frames`` rows per lane. The pad repeats each lane's LAST row —
        which is already its clamp row — so every active lane's decode
        is unaffected. Growth changes the emit jit's cond shape: one
        recompile per doubling, amortized across the pool's lifetime."""
        if self._cond_buf is None or frames <= self._f_cap:
            return
        new_cap = max(gen.next_pow2(frames), 2 * self._f_cap)
        pad = jnp.broadcast_to(
            self._cond_buf[:, -1:, :],
            (self.n, new_cap - self._f_cap, self.cfg.cond_dim))
        self._cond_buf = jnp.concatenate([self._cond_buf, pad], axis=1)
        self._f_cap = new_cap
        if self.mesh is not None:
            self._commit_sharded()

    def extend_cond(self, lane: int, rows):
        """Append conditioning rows to an ACTIVE lane's stream — the
        streaming-TTS-encoder pattern (the pool twin of the solo
        ``set_cond`` progressive extension): the lane keeps serving
        while the encoder produces more rows of the SAME utterance.

        ``rows`` [k, cond_dim] land at the lane's unpadded length and
        the tail past the new end re-clamps to the new last row, all
        device-side (one masked lane write; lane index and length ride
        as traced scalars so every extension shares one executable per
        row-count bucket). Samples already emitted are unaffected —
        samples decoded past the old stream end used its clamp row, so
        extend before the cursor reaches the rows that matter (the
        ``pending``-style guarantee is the caller's scheduling). Grows
        the buffer past ``max_cond_frames`` as needed (_ensure_cap).
        """
        if not self.cfg.cond_dim:
            raise ValueError("extend_cond on a model without cond_dim")
        if lane not in self.active:
            raise ValueError(f"lane {lane} is not active")
        rows = np.asarray(rows, np.float32)
        if rows.ndim != 2 or rows.shape[0] == 0 \
                or rows.shape[1] != self.cfg.cond_dim:
            raise ValueError(
                f"rows must be [k>0, {self.cfg.cond_dim}], "
                f"got {rows.shape}")
        ln, k = self._cond_len[lane], rows.shape[0]
        self._ensure_cap(ln + k)
        # bucket k to a power of two by repeating the last row (clamp
        # semantics make the padded tail == the re-clamped tail, so the
        # traced gather in _pool_extend is exact for any true k <=
        # bucket); the whole lane rewrite is one dispatch
        kb = gen.next_pow2(k)
        rows_dev = jnp.asarray(gen.fit_cond_stream(rows, kb))
        spk_dev = (jnp.int32(self._speakers[lane])
                   if self.cfg.n_speakers else None)
        self._cond_buf = _pool_extend(
            self.params, self._cond_buf, jnp.int32(lane), jnp.int32(ln),
            rows_dev, spk_dev)
        self._cond_len[lane] = ln + k
        if self.mesh is not None:
            self._commit_sharded()
        return self

    def stop(self, lane: int):
        """Release a lane. Its slot keeps computing (garbage nobody
        reads — the static-batch trade) until reused by start()."""
        if lane not in self.active:
            raise ValueError(f"lane {lane} is not active")
        self.active.remove(lane)
        self._free.append(lane)

    # -- decode ----------------------------------------------------------
    def emit(self, n_samples: int):
        """Advance every lane n_samples and return [n_lanes, n_samples]
        quantized levels as an ASYNC device array (enqueue-ahead loops
        overlap dispatch with playback; materialize per lane)."""
        if n_samples % self.cfg.lookback:
            raise ValueError(f"n_samples must be a multiple of lookback "
                             f"({self.cfg.lookback})")
        cond, pos0 = None, 0
        if self.cfg.cond_dim:
            # the WHOLE device-resident buffer + per-lane sample
            # cursors: the decode gathers each lane's rows at its own
            # offset and resolves sub-row phase in-kernel, so any
            # lookback-multiple chunk length works (speaker embedding
            # already folded into the buffer at start(); init_params
            # enforces n_speakers => cond_dim, so no other speaker
            # path exists)
            cond, pos0 = self._cond_buf, self._cursors
        # per-lane noise (lane_keys) — self.key is never consumed on
        # the emit path, so a lane's sampled stream cannot depend on
        # how many chunks the pool served before it joined
        sampled = self.temperature is not None
        levels, self.states, self.hist = gen.generate_levels(
            self.params, self.cfg, self.n, n_samples, self.temperature,
            self.key, cond=cond, initial_states=self.states,
            hist=self.hist, use_pallas=self.use_pallas,
            return_state=True, cond_pos0=pos0,
            lane_keys=self._lane_keys if sampled else None,
            noise_pos0=self._noise_pos)
        # one dispatch for the per-lane counter advances (not one each)
        if cond is not None and sampled:
            self._cursors, self._noise_pos = _advance(
                self._cursors, self._noise_pos, n_samples)
        elif cond is not None:
            self._cursors = self._cursors + n_samples
        elif sampled:
            self._noise_pos = self._noise_pos + n_samples
        return levels

    def emit_waveform(self, n_samples: int):
        return gen.decode_waveform(self.emit(n_samples), self.cfg)


def run_jobs(params, cfg: SampleRNNConfig, jobs, *, n_lanes: int,
             chunk: int | None = None, temperature: float | None = 1.0,
             key=None, use_pallas: bool | str | None = None,
             max_cond_frames: int = 1024, mesh=None,
             enqueue_ahead: bool = True, on_done=None,
             retain_results: bool = True):
    """Continuous-batching batch synthesis: drain a list of
    variable-length jobs through one :class:`StreamPool`.

    This is the pool's production use case as one call: ``n_lanes``
    decode lanes advance in lock-step (one device dispatch per chunk
    for all lanes); each job claims a free lane, runs for its OWN
    requested length, and releases the slot to the next job at a chunk
    boundary — no lane ever waits for the longest utterance in a
    "batch" the way fixed-batch ``generate`` does.

    Because every job's length is known at ``start()``, the whole
    join/leave schedule is deterministic in chunk indices — so the loop
    can run ENQUEUE-AHEAD (dispatch chunk t+1 before materializing
    chunk t; joins are race-free because start()/stop() build new state
    arrays, see the class docstring) without waiting on any output to
    make scheduling decisions.

    jobs: iterable of dicts with keys (all optional unless noted):
      ``id``          hashable result key       (default: the index)
      ``n_samples``   samples to generate — REQUIRED unless ``cond``
                      is given, in which case it defaults to
                      ``cond_rows * cfg.cond_rate`` (the utterance's
                      natural TTS length)
      ``cond``        [frames, cond_dim] conditioning stream
      ``speaker``     int id (required iff the model has n_speakers)
      ``seed_levels`` [L] int prompt the lane continues (n_samples
                      counts only the GENERATED continuation)
      ``seed_cond``   [frames, cond_dim] rows covering the seed
      ``stream_key``  PRNG key pinning this job's sampling noise (a
                      solo ``StreamingGenerator(stream_keys=key)``
                      reproduces the job bit-for-bit)

    Returns ``(results, stats)``: results maps id -> np.int32
    [n_samples] quantized levels (decode with
    :func:`~samplernn_pase_tpu.generate.decode_waveform`); stats has
    ``chunks`` (device dispatches), ``chunk`` (samples per lane per
    dispatch), ``generated`` (sum of requested samples),
    ``utilization`` (requested / dispatched lane-samples — the
    static-batch occupancy), and ``wall_s``. ``on_done(id, levels)``
    fires as each job's last chunk materializes (streaming consumers).
    ``retain_results=False`` returns an empty results dict and drops
    each job's audio after its ``on_done`` fires — a consumer that
    streams jobs out (the CLI writes one wav per completion) should not
    also hold the whole batch's audio in host memory.
    """
    import time

    jobs = list(jobs)
    chunk = int(chunk) if chunk else cfg.lookback
    if chunk % cfg.lookback:
        raise ValueError(
            f"chunk ({chunk}) must be a multiple of lookback "
            f"({cfg.lookback})")
    queue = []                            # validated, reversed for pop()
    for i, job in enumerate(jobs):
        job = dict(job)
        job.setdefault("id", i)
        n = job.get("n_samples")
        if n is None:
            if job.get("cond") is None:
                raise ValueError(
                    f"job {job['id']!r}: n_samples is required when no "
                    "cond stream is given")
            n = int(np.shape(job["cond"])[0]) * cfg.cond_rate
        if int(n) < 1:
            raise ValueError(f"job {job['id']!r}: n_samples must be >= 1")
        if temperature is None and job.get("stream_key") is not None:
            # pool.start would reject this anyway — but only when the
            # job claims a lane, possibly after earlier jobs already
            # streamed out through on_done. Batch validation fails the
            # whole manifest BEFORE any work.
            raise ValueError(
                f"job {job['id']!r}: stream_key on a greedy run "
                "(temperature=None) — there is no sampling noise to pin")
        if job.get("seed_cond") is not None \
                and job.get("seed_levels") is None:
            raise ValueError(
                f"job {job['id']!r}: seed_cond without seed_levels")
        job["n_samples"] = int(n)
        queue.append(job)
    ids = [j["id"] for j in queue]
    if len(set(ids)) != len(ids):
        raise ValueError("job ids must be unique")
    want = {j["id"]: j["n_samples"] for j in queue}
    requested = sum(want.values())
    queue.reverse()

    pool = StreamPool(params, cfg, n_lanes=n_lanes,
                      temperature=temperature, key=key,
                      use_pallas=use_pallas,
                      max_cond_frames=max_cond_frames, mesh=mesh)
    results: dict = {}
    done: set = set()
    pieces: dict = {}                    # id -> [np chunk, ...]
    active: dict = {}                    # lane -> [id, remaining]
    inflight: list = []                  # [(async levels, {lane: id})]
    depth = 1 if enqueue_ahead else 0
    n_chunks = 0

    def _drain(entry):
        levels, snapshot = entry
        arr = np.asarray(levels)
        for lane, jid in snapshot.items():
            # copy: arr[lane] is a VIEW of the full [n_lanes, chunk]
            # batch — one still-running long job would otherwise pin
            # every chunk's whole batch array for its lifetime (host
            # memory n_lanes x longest job instead of 1 x)
            pieces[jid].append(arr[lane].copy())
            if jid not in done and sum(
                    p.shape[0] for p in pieces[jid]) >= want[jid]:
                out = np.concatenate(pieces.pop(jid))[:want[jid]]
                done.add(jid)
                if retain_results:
                    results[jid] = out
                if on_done is not None:
                    on_done(jid, out)

    t0 = time.perf_counter()
    while queue or active:
        while queue and len(pool.active) < pool.n:
            job = queue.pop()
            lane = pool.start(
                cond=job.get("cond"), speaker=job.get("speaker"),
                seed_levels=job.get("seed_levels"),
                seed_cond=job.get("seed_cond"),
                stream_key=job.get("stream_key"))
            active[lane] = [job["id"], job["n_samples"]]
            pieces[job["id"]] = []
        snapshot = {lane: jid for lane, (jid, _) in active.items()}
        levels = pool.emit(chunk)
        n_chunks += 1
        # lanes whose jobs complete with this chunk free their slot NOW
        # (stop() is host bookkeeping; the dispatched chunk keeps the
        # state it was enqueued with) so the next iteration's joins can
        # reuse them without waiting for materialization
        for lane in list(active):
            active[lane][1] -= chunk
            if active[lane][1] <= 0:
                pool.stop(lane)
                del active[lane]
        inflight.append((levels, snapshot))
        while len(inflight) > depth:
            _drain(inflight.pop(0))
    for entry in inflight:
        _drain(entry)
    stats = {
        "jobs": len(jobs), "chunks": n_chunks, "chunk": chunk,
        "lanes": n_lanes, "generated": requested,
        "dispatched": n_chunks * chunk * n_lanes,
        "utilization": (requested / (n_chunks * chunk * n_lanes)
                        if n_chunks else 0.0),
        "wall_s": time.perf_counter() - t0,
    }
    return results, stats
