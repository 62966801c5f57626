"""Pipeline parallelism over the language stack (GPipe-style, TPU-native).

No reference counterpart: the reference's only multi-GPU use is eval data
parallelism via `accelerate launch` (reference README.md:398-412). This
module exists for model scales where one chip (or one tp group) cannot hold
the weights — e.g. Qwen2.5-VL-72B beyond tp=8 — by splitting the LAYER axis
over a `pp` mesh axis: stage s owns layers [s*L/S, (s+1)*L/S) AND that slab
of the KV cache, so weights and cache both scale 1/S per chip.

Grouped video prefill is a natural pipeline workload: the engine already
feeds the stack one 32-frame group at a time (prefill/engine.py group
loop), and groups are sequential only through the per-layer KV cache — which
lives entirely inside its own stage. The schedule is therefore a SKEWED
SOFTWARE PIPELINE over group ticks:

    tick t: stage s processes group (t - s); all S stages busy once t >= S-1
            boundary activations hop one stage per tick via lax.ppermute

One `tick()` dispatch keeps every chip busy on a DIFFERENT group (bubble
only for the first/last S-1 ticks — with 32+ groups per video and pp<=8 the
bubble is <20%), the activation hop is (q_len, C) over ICI per tick, and
each stage's cache appends/pruning are purely local (per-layer `length`
counters shard with the slab).

The prompt/suffix chunk and decode steps are inherently sequential over
stages (one live token stream): `chunk()` runs S sub-steps inside one
shard_map; at sub-step j only stage j's devices take the compute branch of a
`lax.cond` (others skip: no weight streaming, no FLOPs), and the boundary
activation broadcasts via a masked psum. Decode latency is thus one full
weight pass + S small collectives — the same HBM bound as single-chip.

Composition: pp composes with dp (outer axis, independent replicas) AND with
tp INSIDE a stage: when the mesh carries a tp axis > 1, each stage's
projection weights/caches shard their head (or MLP-column) axis over tp and
layer_step runs with spec.tp_axis set — Megatron row-parallel psums after
the o-proj and down-proj, and the pruning predictors reduce their scores
over tp so every shard retains identical token indices
(ops/predictors.select_top_k_indices). sp inside a stage is not composed —
context parallelism (parallel/context_parallel.py) remains the
long-sequence answer on non-pp meshes.

Parity: tests/test_pipeline_parallel.py drives this against the
single-device prefill_step path on a virtual CPU mesh — per-layer lengths
and int8 payloads exactly equal, cache contents and output hidden states
equal within 1e-5, for pp in {2, 4}, with pruning and int8 KV.
tests/test_sharding.py pins engine-level greedy/sampled token parity for
pp=3, pp=3 x tp=2, and chunked streaming.
"""

from __future__ import annotations

from functools import partial
from typing import List, Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from quickvideo_tpu.models.qwen25_vl.language import StepSpec, layer_step
from quickvideo_tpu.ops import kv_cache as kvc


def make_pp_mesh(n_stages: int, devices=None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    if len(devices) < n_stages:
        raise ValueError(f"pp={n_stages} needs {n_stages} devices, have "
                         f"{len(devices)}")
    import numpy as np

    return Mesh(np.array(devices[:n_stages]), axis_names=("pp",))


def _slab(tree, n_stages: int):
    """Stacked (L, ...) param/cache leaves -> (S, L/S, ...) stage slabs."""
    def r(a):
        L = a.shape[0]
        assert L % n_stages == 0, (L, n_stages)
        return a.reshape(n_stages, L // n_stages, *a.shape[1:])

    return jax.tree.map(r, tree)


def _stage_scan(lp_slab, xh, cos, sin, k, v, ks, vs, lengths, rng, spec,
                stage, layers_per_stage):
    """This stage's layers over one token block — prefill_step's scan body
    (models/qwen25_vl/language.py:585-602) on a LOCAL (L/S, ...) slab.
    `li` passed to layer_step is slab-relative (it indexes the local cache
    stack); the rng fold uses the GLOBAL layer index so random predictors
    keep the exact single-device sampling sequence."""

    def body(carry, xs):
        xh_, li, k_, v_, ks_, vs_ = carry
        lp, length = xs
        lrng = jax.random.fold_in(rng, stage * layers_per_stage + li)
        xh_, k_, v_, ks_, vs_, _ = layer_step(
            lp, xh_, cos, sin, k_, v_, length, lrng, spec, li=li,
            k_scale_all=ks_, v_scale_all=vs_,
        )
        return (xh_, li + 1, k_, v_, ks_, vs_), None

    (y, _, k, v, ks, vs), _ = lax.scan(
        body, (xh, jnp.int32(0), k, v, ks, vs), (lp_slab, lengths)
    )
    return y, k, v, ks, vs


class PipelinedStack:
    """The language stack sharded into pp stages, with tick/chunk drivers.

    Owns the slabbed params and the slabbed KV cache. `run_groups` performs
    the skewed-pipeline video prefill; `chunk` runs one sequential
    all-stage pass (prompt prefill / one decode step); `gather_cache`
    reassembles a standard (L, ...) KVCache for inspection or handoff.
    """

    def __init__(self, mesh: Mesh, cfg, params_layers, capacity: int,
                 dtype=jnp.float32, quantized: bool = False,
                 rng: Optional[jax.Array] = None):
        self.mesh = mesh
        self.S = mesh.shape["pp"]
        self.tp = mesh.shape.get("tp", 1)
        self.cfg = cfg
        L = cfg.num_hidden_layers
        if L % self.S:
            raise ValueError(f"num_hidden_layers={L} not divisible by "
                             f"pp={self.S}")
        if self.tp > 1:
            for name, n in (
                ("num_attention_heads", cfg.num_attention_heads),
                ("num_key_value_heads", cfg.num_key_value_heads),
                ("intermediate_size", cfg.intermediate_size),
            ):
                if n % self.tp:
                    raise ValueError(
                        f"{name}={n} not divisible by tp={self.tp} "
                        "(tp-within-a-stage shards heads/MLP columns)"
                    )
        self.Lps = L // self.S
        self.capacity = capacity
        self.quantized = quantized  # False | True/"kv" | "k" (K-only int8)
        self._qk = quantized in (True, "kv", "k")
        self._qv = quantized in (True, "kv")
        self._pspec = self._param_specs(params_layers)
        self.params = jax.tree.map(
            lambda a, s: jax.device_put(a, NamedSharding(mesh, s)),
            _slab(params_layers, self.S), self._pspec,
        )
        cache = kvc.init_cache(
            L, cfg.num_key_value_heads, capacity, cfg.head_dim,
            dtype=dtype, quantized=quantized,
        )
        kspec, vspec, kssp, vssp = self._cache_specs()
        put = lambda a, s: jax.device_put(  # noqa: E731
            a, NamedSharding(mesh, s)
        )
        self.k = put(_slab(cache.k, self.S), kspec)
        self.v = put(_slab(cache.v, self.S), vspec)
        self.ks = (put(_slab(cache.k_scale, self.S), kssp)
                   if self._qk else None)
        self.vs = (put(_slab(cache.v_scale, self.S), vssp)
                   if self._qv else None)
        self.lengths = put(_slab(cache.length, self.S), P("pp"))
        self.rng = rng if rng is not None else jax.random.PRNGKey(0)
        self._bufs = None  # (xh, cos, sin, valid) pipeline registers
        self._tick_jit = {}
        self._chunk_jit = {}

    def _spec(self, spec: StepSpec):
        """Inject this stack's tp composition into a StepSpec (layer_step
        then psums the o-proj/down-proj partials and reduces pruning scores
        over the tp axis)."""
        if self.tp == 1 or spec.tp_axis is not None:
            return spec
        import dataclasses

        return dataclasses.replace(spec, tp_axis="tp", tp_size=self.tp)

    def _param_specs(self, params_layers):
        """Per-leaf PartitionSpecs for the SLABBED (S, Lps, ...) stacked
        layer weights: stage slabs over pp; with tp > 1 the head/column axes
        shard Megatron-style (sharding.param_shardings' rules, one leading
        pp axis added). Quantized leaves: q8 follows the weight; the
        per-out-channel scale keeps the output axis."""
        col = P("pp", None, None, "tp") if self.tp > 1 else P("pp")
        row = P("pp", None, "tp", None) if self.tp > 1 else P("pp")
        out1 = P("pp", None, "tp") if self.tp > 1 else P("pp")
        rep = P("pp")
        by_name = {
            "ln1": rep, "ln2": rep,
            "wq": col, "bq": out1, "wk": col, "bk": out1,
            "wv": col, "bv": out1, "wo": row,
            "wg": col, "wu": col, "wd": row,
        }

        def leaf_spec(name, leaf):
            s = by_name[name]
            if isinstance(leaf, dict) and "q8" in leaf:
                # scale drops the (slabbed) contraction axis: col weights
                # keep the sharded output axis, row weights replicate
                sc = out1 if s is col else rep
                return {"q8": s, "sc": sc}
            return s

        return {
            name: leaf_spec(name, leaf)
            for name, leaf in params_layers.items()
        }

    # -- helpers ------------------------------------------------------------

    def _zero4(self):
        """int8 mode passes real scale arrays; bf16 passes () placeholders
        (shard_map needs concrete operands, same trick as
        context_parallel.py:220-224)."""
        z = jnp.zeros(())
        return (self.ks if self.ks is not None else z,
                self.vs if self.vs is not None else z)

    def _cache_specs(self):
        # cache slabs (S, Lps, Hkv, cap, D): kv heads shard over tp when
        # composed (appends/attention stay local per shard; pruning indices
        # are identical across shards via the score psums)
        pp = P("pp", None, "tp") if self.tp > 1 else P("pp")
        return (pp, pp,
                pp if self._qk else P(),
                pp if self._qv else P())

    # -- skewed pipeline over video groups ----------------------------------

    def _make_tick(self, spec: StepSpec, q_len: int, hd: int):
        S, Lps = self.S, self.Lps
        qk, qv = self._qk, self._qv
        rep = P()
        kspec, vspec, kssp, vssp = self._cache_specs()

        def tick(params, k, v, ks, vs, lengths, xh_buf, cos_buf, sin_buf,
                 valid, fresh_x, fresh_cos, fresh_sin, fresh_valid, rng):
            # local blocks carry a leading stage axis of size 1
            lp = jax.tree.map(lambda a: a[0], params)
            stage = lax.axis_index("pp")
            is0 = (stage == 0)
            # tick t, stage s works on group (t - s): stage 0 takes THIS
            # tick's fresh group; stage s>0 takes the activation its
            # predecessor shifted in at the END of the previous tick
            xh_c = jnp.where(is0, fresh_x, xh_buf[0])
            cos_c = jnp.where(is0, fresh_cos, cos_buf[0])
            sin_c = jnp.where(is0, fresh_sin, sin_buf[0])
            val_c = jnp.where(is0, fresh_valid, valid[0])
            y, k0, v0, ks0, vs0 = _stage_scan(
                lp, xh_c, cos_c, sin_c,
                k[0], v[0],
                ks[0] if qk else None, vs[0] if qv else None,
                lengths[0], rng, spec, stage, Lps,
            )
            # junk groups (pipeline fill/drain) still WRITE at the current
            # length, but the length only advances for valid ones — the next
            # valid group overwrites the junk rows (the same garbage-above-
            # length contract as the batched-QA length-reset fork)
            adv = jnp.where(val_c > 0, jnp.int32(spec.append_n), 0)
            new_len = lengths[0] + adv
            # hop boundary activations (and their rotary tables + validity)
            # one stage forward for the next tick
            perm = [(i, i + 1) for i in range(S - 1)]
            xh_n = lax.ppermute(y, "pp", perm)
            cos_n = lax.ppermute(cos_c, "pp", perm)
            sin_n = lax.ppermute(sin_c, "pp", perm)
            val_n = lax.ppermute(val_c, "pp", perm)
            out = (k0[None], v0[None],
                   ks0[None] if qk else ks,
                   vs0[None] if qv else vs,
                   new_len[None], xh_n[None], cos_n[None], sin_n[None],
                   val_n[None])
            return out

        pp = P("pp")
        in_specs = (self._pspec, kspec, vspec, kssp, vssp, pp,
                    pp, pp, pp, pp, rep, rep, rep, rep, rep)
        out_specs = (kspec, vspec, kssp, vssp, pp, pp, pp, pp, pp)
        # donate cache + pipeline registers (NOT the () scale placeholders
        # of the modes without that scale, which are re-fed every tick)
        donate = (1, 2, 5, 6, 7, 8, 9)
        donate += (3,) if qk else ()
        donate += (4,) if qv else ()
        return jax.jit(jax.shard_map(
            tick, mesh=self.mesh, in_specs=in_specs, out_specs=out_specs,
            check_vma=False,
        ), donate_argnums=donate)

    def start_stream(self, spec: StepSpec, q_len: int, hidden_size: int,
                     head_dim: int, dtype, table_dtype) -> None:
        """Open a skewed-pipeline stream: allocate the pipeline registers and
        compile the tick for (spec, q_len). Groups then arrive one at a time
        via push_group (the engine streams them off the decode pipeline);
        end_stream drains the S-1 in-flight groups. All pushed groups share
        q_len/spec (uniform specs — decay/cascade schedules take the engine's
        unrolled path, which pp does not serve)."""
        assert self._bufs is None, "stream already open"
        spec = self._spec(spec)
        S = self.S
        key = (spec, q_len)
        if key not in self._tick_jit:
            self._tick_jit[key] = self._make_tick(spec, q_len, head_dim)
        sh = NamedSharding(self.mesh, P("pp"))
        xh_buf = jax.device_put(jnp.zeros((S, q_len, hidden_size), dtype), sh)
        cos_buf = jax.device_put(jnp.zeros((S, q_len, head_dim), table_dtype),
                                 sh)
        sin_buf = jax.device_put(jnp.zeros((S, q_len, head_dim), table_dtype),
                                 sh)
        valid = jax.device_put(jnp.zeros((S,), jnp.int32), sh)
        zero_x = jnp.zeros((q_len, hidden_size), dtype)
        zero_t = jnp.zeros((q_len, head_dim), table_dtype)
        self._bufs = [self._tick_jit[key], xh_buf, cos_buf, sin_buf, valid,
                      zero_x, zero_t]

    @property
    def stream_open(self) -> bool:
        return self._bufs is not None

    def _tick(self, fx, fc, fs, live: bool) -> None:
        tick, xh_buf, cos_buf, sin_buf, valid, zero_x, zero_t = self._bufs
        ks, vs = self._zero4()
        (self.k, self.v, k_s, v_s, self.lengths,
         xh_buf, cos_buf, sin_buf, valid) = tick(
            self.params, self.k, self.v, ks, vs, self.lengths,
            xh_buf, cos_buf, sin_buf, valid,
            fx, fc, fs, jnp.int32(1 if live else 0), self.rng,
        )
        if self._qk:
            self.ks = k_s
        if self._qv:
            self.vs = v_s
        self._bufs = [tick, xh_buf, cos_buf, sin_buf, valid, zero_x, zero_t]

    def push_group(self, x: jax.Array, cos: jax.Array,
                   sin: jax.Array) -> None:
        """Feed one group into stage 0 (one tick: every stage advances its
        own in-flight group)."""
        self._tick(x, cos, sin, live=True)

    def end_stream(self) -> None:
        """Drain the pipeline: S-1 junk ticks flush the in-flight groups
        (their cache writes land but only valid groups advance lengths)."""
        _, _, _, _, _, zero_x, zero_t = self._bufs
        for _ in range(self.S - 1):
            self._tick(zero_x, zero_t, zero_t, live=False)
        self._bufs = None

    def run_groups(self, group_embeds: List[jax.Array],
                   group_cos: List[jax.Array], group_sin: List[jax.Array],
                   spec: StepSpec) -> None:
        """Push all video groups through the pipeline: len(groups) + S - 1
        ticks, one dispatch each (the engine's dispatch-per-group pattern)."""
        q_len = int(group_embeds[0].shape[0])
        hd = int(group_cos[0].shape[-1])
        C = int(group_embeds[0].shape[-1])
        self.start_stream(spec, q_len, C, hd, group_embeds[0].dtype,
                          group_cos[0].dtype)
        for x, c, s in zip(group_embeds, group_cos, group_sin):
            self.push_group(x, c, s)
        self.end_stream()

    # -- sequential all-stage pass (prompt prefill / decode step) -----------

    def _make_chunk(self, spec: StepSpec):
        S, Lps = self.S, self.Lps
        qk, qv = self._qk, self._qv
        kspec, vspec, kssp, vssp = self._cache_specs()

        def chunk(params, k, v, ks, vs, lengths, xh, cos, sin, rng):
            lp = jax.tree.map(lambda a: a[0], params)
            stage = lax.axis_index("pp")
            k0, v0 = k[0], v[0]
            ks0 = ks[0] if qk else None
            vs0 = vs[0] if qv else None
            ln0 = lengths[0]
            for sidx in range(S):  # static unroll: one live stage per step
                def run(ops):
                    xh_, k_, v_, ks_, vs_, ln_ = ops
                    y, k_, v_, ks2, vs2 = _stage_scan(
                        lp, xh_, cos, sin, k_, v_,
                        ks_ if qk else None, vs_ if qv else None,
                        ln_, rng, spec, stage, Lps,
                    )
                    if not qk:
                        ks2 = ops[3]
                    if not qv:
                        vs2 = ops[4]
                    return y, k_, v_, ks2, vs2, ln_ + spec.append_n

                def skip(ops):
                    return ops

                sc_k = ks0 if qk else jnp.zeros(())
                sc_v = vs0 if qv else jnp.zeros(())
                # only stage sidx streams its weights this sub-step; the
                # rest take the identity branch (decode stays HBM-bound at
                # ONE full weight pass per token, not S)
                y, k0, v0, sc_k, sc_v, ln0 = lax.cond(
                    stage == sidx, run, skip,
                    (xh, k0, v0, sc_k, sc_v, ln0),
                )
                if qk:
                    ks0 = sc_k
                if qv:
                    vs0 = sc_v
                # broadcast the live stage's output to everyone
                xh = lax.psum(
                    jnp.where(stage == sidx, y, jnp.zeros_like(y)), "pp"
                )
            return (xh, k0[None], v0[None],
                    ks0[None] if qk else ks,
                    vs0[None] if qv else vs, ln0[None])

        pp = P("pp")
        rep = P()
        in_specs = (self._pspec, kspec, vspec, kssp, vssp, pp,
                    rep, rep, rep, rep)
        out_specs = (rep, kspec, vspec, kssp, vssp, pp)
        return jax.jit(jax.shard_map(
            chunk, mesh=self.mesh, in_specs=in_specs, out_specs=out_specs,
            check_vma=False,
        ), donate_argnums=(1, 2, 5) + ((3,) if qk else ())
            + ((4,) if qv else ()))

    def chunk(self, xh: jax.Array, cos: jax.Array, sin: jax.Array,
              spec: StepSpec) -> jax.Array:
        """One full pass of all stages over a replicated token block;
        appends spec.append_n rows per layer. Returns final hidden states."""
        spec = self._spec(spec)
        key = (spec, int(xh.shape[0]))
        if key not in self._chunk_jit:
            self._chunk_jit[key] = self._make_chunk(spec)
        ks, vs = self._zero4()
        (y, self.k, self.v, k_s, v_s, self.lengths) = self._chunk_jit[key](
            self.params, self.k, self.v, ks, vs, self.lengths,
            xh, cos, sin, self.rng,
        )
        if self._qk:
            self.ks = k_s
        if self._qv:
            self.vs = v_s
        return y

    # -- whole-chunk decode (device-side loop + sampling) --------------------

    def _make_decode_chunk(self, spec: StepSpec, n: int, greedy: bool,
                           top_p, top_k, filter_fn, vocab: int):
        S, Lps = self.S, self.Lps
        qk, qv = self._qk, self._qv
        kspec, vspec, kssp, vssp = self._cache_specs()
        from quickvideo_tpu.models.qwen25_vl.language import (
            compute_logits,
            embed_tokens,
        )

        cfg = self.cfg

        def decode(params, head, k, v, ks, vs, lengths, tok0, cos_chunk,
                   sin_chunk, eos_ids, n_stop, rng, temperature, srng):
            lp = jax.tree.map(lambda a: a[0], params)
            stage = lax.axis_index("pp")
            fill = eos_ids[0]

            def cond(carry):
                _, _, _, _, _, tok, _, i, _ = carry
                bound = jnp.minimum(jnp.int32(n), n_stop)
                return (i < bound) & jnp.logical_not(
                    jnp.any(tok == eos_ids)
                )

            def body(carry):
                k0, v0, ks0, vs0, ln0, tok, srng_, i, toks = carry
                xh = embed_tokens(head, tok[None])  # (1, C)
                cos_i = lax.dynamic_slice_in_dim(cos_chunk, i, 1)
                sin_i = lax.dynamic_slice_in_dim(sin_chunk, i, 1)
                for sidx in range(S):  # one live stage per sub-step (the
                    # rest take the identity branch: no weight streaming —
                    # decode stays ONE full weight pass per token, same as
                    # chunk())
                    def run(ops):
                        xh_, k_, v_, ks_, vs_, ln_ = ops
                        y, k_, v_, ks2, vs2 = _stage_scan(
                            lp, xh_, cos_i, sin_i, k_, v_,
                            ks_ if qk else None, vs_ if qv else None,
                            ln_, rng, spec, stage, Lps,
                        )
                        if not qk:
                            ks2 = ops[3]
                        if not qv:
                            vs2 = ops[4]
                        return y, k_, v_, ks2, vs2, ln_ + spec.append_n

                    def skip(ops):
                        return ops

                    sc_k = ks0 if qk else jnp.zeros(())
                    sc_v = vs0 if qv else jnp.zeros(())
                    xh, k0, v0, sc_k, sc_v, ln0 = lax.cond(
                        stage == sidx, run, skip,
                        (xh, k0, v0, sc_k, sc_v, ln0),
                    )
                    if qk:
                        ks0 = sc_k
                    if qv:
                        vs0 = sc_v
                    xh = lax.psum(
                        jnp.where(stage == sidx, xh, jnp.zeros_like(xh)),
                        "pp",
                    )
                # only the LAST stage streams the lm_head (the cond's
                # untaken branch reads no weights); the chosen token
                # broadcasts as one masked-psum scalar
                lg = lax.cond(
                    stage == S - 1,
                    lambda h: compute_logits(head, h[-1], cfg),
                    lambda h: jnp.zeros((vocab,), jnp.float32),
                    xh,
                )
                if greedy:
                    nxt_l = jnp.argmax(lg).astype(jnp.int32)
                else:
                    srng_, sub = jax.random.split(srng_)
                    flt = filter_fn(lg, top_p, top_k)
                    nxt_l = jax.random.categorical(
                        sub, flt / temperature
                    ).astype(jnp.int32)
                nxt = lax.psum(jnp.where(stage == S - 1, nxt_l, 0), "pp")
                toks = toks.at[i].set(nxt)
                return k0, v0, ks0, vs0, ln0, nxt, srng_, i + 1, toks

            k0, v0, ks0, vs0, ln0, _, _, _, toks = lax.while_loop(
                cond, body,
                (k[0], v[0], ks[0] if qk else ks, vs[0] if qv else vs,
                 lengths[0], tok0, srng, jnp.int32(0),
                 jnp.full((n,), fill, jnp.int32)),
            )
            return (k0[None], v0[None],
                    ks0[None] if qk else ks,
                    vs0[None] if qv else vs, ln0[None], toks)

        pp = P("pp")
        rep = P()
        in_specs = (self._pspec, rep, kspec, vspec, kssp, vssp, pp,
                    rep, rep, rep, rep, rep, rep, rep, rep)
        out_specs = (kspec, vspec, kssp, vssp, pp, rep)
        return jax.jit(jax.shard_map(
            decode, mesh=self.mesh, in_specs=in_specs, out_specs=out_specs,
            check_vma=False,
        ), donate_argnums=(2, 3, 6) + ((4,) if qk else ())
            + ((5,) if qv else ()))

    def decode_chunk(self, head, tok0, cos_chunk, sin_chunk, eos_ids,
                     n_stop, spec: StepSpec, *, greedy=True, rng=None,
                     temperature=1.0, top_p=None, top_k=None,
                     filter_fn=None, vocab: int = 0):
        """Decode up to `n_stop` tokens in ONE dispatch: the in-graph
        while_loop embeds, runs all stages per token (one full weight pass),
        computes logits + argmax/sampling on the LAST stage, and broadcasts
        each token over the mesh — no per-token host RTT (the pp analogue
        of the engine's _decode_chunk_body / _decode_sample_chunk_body).
        `head` = replicated {embed, norm, lm_head} params. Returns the
        (n,) token array (slots past EOS hold the EOS-fill value)."""
        spec = self._spec(spec)
        n = int(cos_chunk.shape[0])
        key = ("dec", spec, n, greedy, top_p, top_k)
        if key not in self._chunk_jit:
            self._chunk_jit[key] = self._make_decode_chunk(
                spec, n, greedy, top_p, top_k, filter_fn, vocab
            )
        ks, vs = self._zero4()
        srng = rng if rng is not None else self.rng
        (self.k, self.v, k_s, v_s, self.lengths, toks) = self._chunk_jit[
            key
        ](
            self.params, head, self.k, self.v, ks, vs, self.lengths,
            jnp.int32(tok0), cos_chunk, sin_chunk, eos_ids,
            jnp.int32(n_stop), self.rng, jnp.float32(temperature), srng,
        )
        if self._qk:
            self.ks = k_s
        if self._qv:
            self.vs = v_s
        return toks

    # -- reassembly ----------------------------------------------------------

    def gather_cache(self) -> kvc.KVCache:
        """Slabs -> standard (L, ...) KVCache (device-replicated)."""
        def un(a):
            return a.reshape(-1, *a.shape[2:])

        return kvc.KVCache(
            k=un(jax.device_get(self.k)),
            v=un(jax.device_get(self.v)),
            length=jax.device_get(self.lengths).reshape(-1),
            k_scale=un(jax.device_get(self.ks)) if self._qk else None,
            v_scale=un(jax.device_get(self.vs)) if self._qv else None,
        )
