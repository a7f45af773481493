"""Pipeline parallelism: GPipe-style microbatch pipelining of CPM stages.

The reference's only parallelism is single-process ``nn.DataParallel``
(reference: train_rtpose_light3d_kdh3d.py:310). The multi-stage CPM family
it trains (rtpose_light3d has 2 stages here, 6 in classic CPM/rtpose —
reference: lib/network/rtpose_light3d.py:249-363) is the textbook shape for
pipeline parallelism on a TPU pod: every stage is the SAME program (same
branch specs, same output shapes), stages communicate one activation tensor,
and the per-stage compute is large enough to amortize one ICI hop.

Design (the third parallelism axis next to parallel/mesh.py data
parallelism and parallel/tensor.py channel sharding):

- mesh ("data", "pipe"): the stem (stride-8 trunk) runs data-parallel over
  the full mesh exactly as before; the CPM refinement stages are placed one
  per "pipe" device.
- Uniform stage program: in the sequential model, stage 1 consumes the
  128-ch stem and later stages consume concat(paf, heat, z, stem) (187 ch).
  Here EVERY stage consumes the 187-ch concat layout, with stage 1's extra
  input channels fed zeros; ``build_pipelined_variables`` embeds the
  sequential model's stage-1 first-conv kernels at the stem channel slice
  and zero-fills the dead slice, so the pipelined forward is numerically
  identical to the sequential model (zero inputs x any weights == 0 and the
  dead slices receive zero gradient, so they stay inert under training).
  Stage parameters are stacked on a leading (n_stages,) axis and sharded
  over "pipe".
- GPipe schedule inside one ``shard_map``: the local batch splits into
  n_micro microbatches; a ``lax.scan`` over n_micro + n_pipe - 1 ticks has
  every device apply its stage to its current activation, ``ppermute`` the
  (paf | heat | z | stem) carry one hop down the pipe, and device 0 inject
  the next microbatch. Stage i's output for microbatch m appears at tick
  m + i, so each device's emitted stack aligns with one dynamic slice.
  The pipeline bubble is the standard (n_pipe - 1) / (n_micro + n_pipe - 1).
- Backward: ``jax.grad`` differentiates straight through the scan and the
  ppermute (reverse permutes on the cotangents) — no hand-written backward
  schedule. BatchNorm runs in running-stats mode inside the pipeline (the
  usual GPipe/microbatch-BN caveat, documented at make_pipeline_train_step).

Numerical parity with the sequential RTPoseLight3D (forward AND loss) is
pinned on the CPU mesh in tests/test_pipeline.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

import flax.linen as nn

from popnet_tpu.models.layers import CPMBranch


class CPMStageUniform(nn.Module):
    """One rtpose_light3d refinement stage with the uniform 187-ch input
    contract (paf | heat | z | stem). Branch specs match
    models/rtpose_light3d.py stage() exactly."""

    num_parts: int = 15
    num_limbs: int = 14
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        paf = CPMBranch(
            spec=((256, 3), (256, 3), (256, 3), (128, 1)),
            out_features=2 * self.num_limbs, out_kernel=1,
            dtype=self.dtype, name="paf",
        )(x, train)
        heat = CPMBranch(
            spec=((128, 3),) * 4,
            out_features=self.num_parts + 1, out_kernel=3,
            dtype=self.dtype, name="heat",
        )(x, train)
        z = CPMBranch(
            spec=((128, 3), (64, 3), (64, 3), (64, 3)),
            out_features=self.num_limbs + 1, out_kernel=3,
            dtype=self.dtype, name="z",
        )(x, train)
        paf = (nn.sigmoid(paf) - 0.5) * 4.0
        heat = nn.sigmoid(heat)
        z = (nn.sigmoid(z) - 0.5) * 4.0
        return paf, heat, z


def stage_channels(num_parts: int = 15, num_limbs: int = 14) -> int:
    """C_out of one stage; the concat layout is [paf 2L | heat K+1 |
    z L+1 | stem 128], so C_out is also the stem channel offset."""
    return 2 * num_limbs + (num_parts + 1) + (num_limbs + 1)


def build_pipelined_variables(variables, num_stages: int = 2,
                              num_parts: int = 15, num_limbs: int = 14):
    """Sequential RTPoseLight3D variables -> (stem_vars, stacked stage vars).

    Stage i's branch subtrees ("stage{i}_paf" etc.) are renamed to the
    CPMStageUniform layout and stacked on a new leading axis. Stage 1's
    first-conv kernels (input dim 128) are embedded at the stem slice
    [C_out:] of a zero (Cin=C_out+128)-kernel so the uniform stage computes
    exactly what the sequential stage 1 computed on concat(0, 0, 0, stem).
    """
    c_out = stage_channels(num_parts, num_limbs)

    def fix_first_conv(branch_tree):
        # CPMBranch's first hidden conv is ConvBN_0/Conv_0
        kern = branch_tree["ConvBN_0"]["Conv_0"]["kernel"]
        cin = kern.shape[2]
        if cin == c_out + 128:
            return branch_tree
        wide = jnp.zeros(kern.shape[:2] + (c_out + 128, kern.shape[3]), kern.dtype)
        wide = wide.at[:, :, c_out:, :].set(kern)
        out = dict(branch_tree)
        cb0 = dict(out["ConvBN_0"])
        conv0 = dict(cb0["Conv_0"])
        conv0["kernel"] = wide
        cb0["Conv_0"] = conv0
        out["ConvBN_0"] = cb0
        return out

    def stage_tree(col, i):
        t = {
            "paf": col[f"stage{i}_paf"],
            "heat": col[f"stage{i}_heat"],
            "z": col[f"stage{i}_z"],
        }
        if i == 1 and col is variables["params"]:
            t = {k: fix_first_conv(v) for k, v in t.items()}
        return t

    stacked = {}
    for coll in variables:
        trees = [stage_tree(variables[coll], i) for i in range(1, num_stages + 1)]
        stacked[coll] = jax.tree.map(lambda *xs: jnp.stack(xs, 0), *trees)
    stem_vars = {coll: {"stem": variables[coll]["stem"]} for coll in variables
                 if "stem" in variables[coll]}
    return stem_vars, stacked


def unstack_pipelined_variables(stem_vars, stacked, num_stages: int = 2,
                                num_parts: int = 15, num_limbs: int = 14):
    """Inverse of build_pipelined_variables: pipelined {stem, (S,)-stacked
    stages} -> sequential RTPoseLight3D variables, so a pipeline-trained
    checkpoint restores into the standard model for evaluation/serving.
    Stage 1's widened first-conv kernels are cut back to the stem slice
    (the dead [0:c_out] slice stays zero under training — gradients through
    zero inputs are zero — so slicing it off is exact)."""
    c_out = stage_channels(num_parts, num_limbs)

    def cut_first_conv(branch_tree):
        kern = branch_tree["ConvBN_0"]["Conv_0"]["kernel"]
        if kern.shape[2] != c_out + 128:
            return branch_tree
        out = dict(branch_tree)
        cb0 = dict(out["ConvBN_0"])
        conv0 = dict(cb0["Conv_0"])
        conv0["kernel"] = kern[:, :, c_out:, :]
        cb0["Conv_0"] = conv0
        out["ConvBN_0"] = cb0
        return out

    variables = {}
    for coll in stacked:
        tree = dict(stem_vars.get(coll, {}))
        for i in range(1, num_stages + 1):
            for branch in ("paf", "heat", "z"):
                sub = jax.tree.map(lambda a, i=i: a[i - 1], stacked[coll][branch])
                if i == 1 and coll == "params":
                    sub = cut_first_conv(sub)
                tree[f"stage{i}_{branch}"] = sub
        variables[coll] = tree
    return variables


def create_pipeline_train_state(variables, num_stages: int = 2,
                                num_parts: int = 15, num_limbs: int = 14,
                                learning_rate: float = 0.05, **state_kw):
    """TrainState over the pipelined parameterization: params/batch_stats
    split into {"stem": replicated trunk, "stages": (S, ...) stacks}.
    `variables` are the sequential RTPoseLight3D's init variables."""
    import optax

    from popnet_tpu.train.state import TrainState, sgd_nesterov

    stem_vars, stacked = build_pipelined_variables(
        variables, num_stages, num_parts, num_limbs
    )
    params = {"stem": stem_vars["params"]["stem"], "stages": stacked["params"]}
    batch_stats = None
    if "batch_stats" in variables:
        batch_stats = {
            "stem": stem_vars["batch_stats"]["stem"],
            "stages": stacked["batch_stats"],
        }

    tx = state_kw.pop("tx", None)
    if tx is None:
        tx = optax.inject_hyperparams(
            sgd_nesterov, static_args=("momentum", "weight_decay")
        )(learning_rate=learning_rate, momentum=state_kw.pop("momentum", 0.9),
          weight_decay=state_kw.pop("weight_decay", 0.0))
    return TrainState.create(
        apply_fn=None, params=params, tx=tx, batch_stats=batch_stats
    )


def make_pipe_mesh(n_pipe: int, devices=None, axis_names=("data", "pipe")):
    """All (or given) devices as a (n/n_pipe, n_pipe) mesh. The pipe axis
    should ride the fastest ICI dimension (activations hop every tick)."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if n % n_pipe:
        raise ValueError(f"{n} devices not divisible by n_pipe={n_pipe}")
    return Mesh(np.array(devices).reshape(n // n_pipe, n_pipe), axis_names)


def _run_pipeline(mesh: Mesh, stage_vars, inject, n_micro: int, c_out: int,
                  apply_stage):
    """The GPipe schedule, generic over the stage program.

    inject: (B, h, w, c_in) FULL tick inputs ingested by pipe device 0 (the
    uniform stage input layout — carried outputs followed by the pass-through
    features). apply_stage(svars, x) -> tuple of output maps whose channel
    concat is c_out wide. Returns (S, B, h, w, c_out) per-stage outputs in
    global batch order.
    """
    n_pipe = mesh.shape["pipe"]
    n_data = mesh.shape["data"]
    B, h, w, c_in = inject.shape
    b_local = B // n_data
    if b_local % n_micro:
        raise ValueError(f"local batch {b_local} not divisible by {n_micro}")
    mb = b_local // n_micro

    def per_device(svars, x_loc):
        idx = jax.lax.axis_index("pipe")
        svars = jax.tree.map(lambda a: a[0], svars)

        xm = x_loc.reshape(n_micro, mb, h, w, c_in)
        pad = jnp.zeros((n_pipe - 1, mb, h, w, c_in), x_loc.dtype)
        xs = jnp.concatenate([xm, pad], 0)                     # (T, ...)

        def tick(cur, xt):
            # device 0 ingests microbatch t at the TOP of tick t; everyone
            # else processes the carry its upstream neighbor sent last tick
            cur = jnp.where(idx == 0, xt, cur)
            y = jnp.concatenate(apply_stage(svars, cur), -1)   # (mb,h,w,c_out)
            carry = jnp.concatenate([y, cur[..., c_out:]], -1)
            perm = [(i, (i + 1) % n_pipe) for i in range(n_pipe)]
            nxt = jax.lax.ppermute(carry, "pipe", perm)
            return nxt, y

        cur0 = jnp.zeros((mb, h, w, c_in), x_loc.dtype)
        # the carry becomes varying over both mesh axes after the first
        # ppermute/where; scan requires the initial carry typed the same
        cur0 = jax.lax.pcast(cur0, ("data", "pipe"), to="varying")
        _, ys = jax.lax.scan(tick, cur0, xs)                   # (T, mb, ...)
        # stage idx's output for microbatch m was produced at tick m + idx
        aligned = jax.lax.dynamic_slice_in_dim(ys, idx, n_micro, 0)
        return aligned[None]                                   # (1, nm, mb, ...)

    out = jax.shard_map(
        per_device,
        mesh=mesh,
        in_specs=(P("pipe"), P("data")),
        out_specs=P("pipe", None, "data"),
    )(stage_vars, inject)
    # (S, n_micro, n_data*mb, h, w, c_out): dim 2 is data-shard-major; the
    # global sample at (d, m, r) is batch index d*b_local + m*mb + r.
    S = out.shape[0]
    out = out.reshape(S, n_micro, n_data, mb, h, w, c_out)
    return out.transpose(0, 2, 1, 3, 4, 5, 6).reshape(S, B, h, w, c_out)


def pipeline_stages(mesh: Mesh, stage_vars, stem_out, n_micro: int,
                    num_parts: int = 15, num_limbs: int = 14,
                    dtype=jnp.float32):
    """Run the stacked CPM stages as a GPipe pipeline over mesh axis "pipe".

    stem_out: (B, h, w, 128) stem activations (global batch order).
    Returns saved_for_loss: [paf1, heat1, z1, ..., pafS, heatS, zS], each
    (B, h, w, c) in global batch order — the exact rtpose_light3d_loss
    contract (losses/losses.py:39).
    """
    B, h, w, _ = stem_out.shape
    c_out = stage_channels(num_parts, num_limbs)
    stage = CPMStageUniform(num_parts=num_parts, num_limbs=num_limbs, dtype=dtype)
    # stage 1's tick input: zeros in the carried-output slice + the stem
    inject = jnp.concatenate(
        [jnp.zeros((B, h, w, c_out), stem_out.dtype), stem_out], -1
    )
    out = _run_pipeline(
        mesh, stage_vars, inject, n_micro, c_out,
        lambda sv, x: stage.apply(sv, x, train=False),
    )

    saved = []
    k1 = num_parts + 1
    for s in range(out.shape[0]):
        paf = out[s, ..., : 2 * num_limbs]
        heat = out[s, ..., 2 * num_limbs : 2 * num_limbs + k1]
        z = out[s, ..., 2 * num_limbs + k1 :]
        saved += [paf, heat, z]
    return saved


# ---------------------------------------------------------------------------
# 6-stage rtpose_vgg pipeline — the textbook GPipe case (VERDICT r3 item 6).
# The classic CPM stack (reference: lib/network/rtpose_vgg.py:59-250) runs
# SIX stages; stages 2..6 are already a uniform program (five 7x7 convs +
# 1x1 per branch, input = concat(paf 2L | heat K+1 | feat 128) = 185 ch), so
# no zero-widening trick is needed: the front (trunk + the differently-
# shaped stage 1) runs data-parallel, and stages 2..6 pipeline one per
# "pipe" device. With P=5 pipe stages the bubble fraction
# (P-1)/(n_micro+P-1) actually pays: 4/12 at n_micro=8 vs 1/9 for the
# 2-stage depth family — deeper stacks amortize GPipe better.
# ---------------------------------------------------------------------------


class VGGStageUniform(nn.Module):
    """One rtpose_vgg refinement stage (stage >= 2): PAF + heat branches,
    five 7x7 convs + 1x1, relu, no BN — branch specs match
    models/rtpose_vgg.py's stage>=2 exactly."""

    num_parts: int = 18
    num_limbs: int = 19
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        spec = ((128, 7),) * 5 + ((128, 1),)
        paf = CPMBranch(spec, 2 * self.num_limbs, 1, self.dtype,
                        act="relu", norm=False, name="paf")(x, train)
        heat = CPMBranch(spec, self.num_parts + 1, 1, self.dtype,
                         act="relu", norm=False, name="heat")(x, train)
        return paf, heat


def vgg_stage_channels(num_parts: int = 18, num_limbs: int = 19) -> int:
    return 2 * num_limbs + (num_parts + 1)


def build_vgg_pipelined_variables(variables, num_stages: int = 6):
    """Sequential RTPoseVGG variables -> (front_vars, stacked stage vars).

    front = trunk + stage 1 (its 3x3 spec differs from the uniform 7x7
    stages, so it runs with the trunk, data-parallel); stages 2..num_stages
    stack on a leading (S-1,) axis for the pipe."""
    front_keys = ("trunk", "stage1_paf", "stage1_heat")
    front_vars = {
        coll: {k: variables[coll][k] for k in front_keys if k in variables[coll]}
        for coll in variables
    }
    stacked = {}
    for coll in variables:
        # stage branches are norm-free convs: only "params" has them (the
        # mobilenet trunk's batch_stats live in front_vars)
        if any(f"stage{i}_paf" not in variables[coll]
               for i in range(2, num_stages + 1)):
            continue
        trees = [
            {"paf": variables[coll][f"stage{i}_paf"],
             "heat": variables[coll][f"stage{i}_heat"]}
            for i in range(2, num_stages + 1)
        ]
        stacked[coll] = jax.tree.map(lambda *xs: jnp.stack(xs, 0), *trees)
    return front_vars, stacked


def unstack_vgg_pipelined_variables(front_vars, stacked, num_stages: int = 6):
    """Inverse of build_vgg_pipelined_variables -> sequential RTPoseVGG
    variables (for evaluation/serving of a pipeline-trained model)."""
    variables = {}
    for coll in set(front_vars) | set(stacked):
        tree = dict(front_vars.get(coll, {}))
        if coll in stacked:
            for i in range(2, num_stages + 1):
                for branch in ("paf", "heat"):
                    tree[f"stage{i}_{branch}"] = jax.tree.map(
                        lambda a, i=i: a[i - 2], stacked[coll][branch]
                    )
        variables[coll] = tree
    return variables


def vgg_pipeline_stages(mesh: Mesh, stage_vars, paf1, heat1, feat,
                        n_micro: int, num_parts: int = 18,
                        num_limbs: int = 19, dtype=jnp.float32):
    """Pipeline rtpose_vgg stages 2..S over mesh axis "pipe".

    paf1/heat1: stage-1 outputs, feat: trunk features (all global batch
    order). Returns saved_for_loss [paf1, heat1, paf2, heat2, ...] — the
    rtpose_light_loss contract (losses/losses.py:84)."""
    c_out = vgg_stage_channels(num_parts, num_limbs)
    stage = VGGStageUniform(num_parts=num_parts, num_limbs=num_limbs,
                            dtype=dtype)
    inject = jnp.concatenate([paf1, heat1, feat], -1)
    out = _run_pipeline(
        mesh, stage_vars, inject, n_micro, c_out,
        lambda sv, x: stage.apply(sv, x, train=False),
    )
    saved = [paf1, heat1]
    for s in range(out.shape[0]):
        saved += [out[s, ..., : 2 * num_limbs], out[s, ..., 2 * num_limbs :]]
    return saved


def create_vgg_pipeline_train_state(variables, num_stages: int = 6,
                                    learning_rate: float = 1e-4, **state_kw):
    """TrainState over the pipelined rtpose_vgg parameterization:
    {"front": trunk + stage1 (replicated), "stages": (S-1,) stacks}."""
    import optax

    from popnet_tpu.train.state import TrainState, sgd_nesterov

    front_vars, stacked = build_vgg_pipelined_variables(variables, num_stages)
    params = {"front": front_vars["params"], "stages": stacked["params"]}
    batch_stats = None
    if "batch_stats" in variables and variables["batch_stats"]:
        batch_stats = {
            "front": front_vars.get("batch_stats", {}),
            "stages": stacked.get("batch_stats", {}),
        }
    tx = state_kw.pop("tx", None)
    if tx is None:
        tx = optax.inject_hyperparams(
            sgd_nesterov, static_args=("momentum", "weight_decay")
        )(learning_rate=learning_rate, momentum=state_kw.pop("momentum", 0.9),
          weight_decay=state_kw.pop("weight_decay", 0.0))
    return TrainState.create(
        apply_fn=None, params=params, tx=tx, batch_stats=batch_stats
    )


def make_vgg_pipeline_train_step(mesh: Mesh, n_micro: int,
                                 num_parts: int = 18, num_limbs: int = 19,
                                 num_stages: int = 6, trunk: str = "vgg19",
                                 dtype=jnp.float32):
    """Pipelined 6-stage rtpose_vgg train step over a ("data", "pipe")
    mesh: front (trunk + stage 1) data-parallel, stages 2..S pipelined,
    per-stage PAF+heat MSE (the COCO recipe, train/steps.py
    make_rtpose_vgg_train_step). Same GPipe/BN caveats as
    make_pipeline_train_step."""
    from popnet_tpu.losses.losses import rtpose_light_loss
    from popnet_tpu.models.layers import CPMBranch as _CPMBranch
    from popnet_tpu.models.rtpose_vgg import MobileNetTrunk, VGG19Trunk

    trunk_cls = {"vgg19": VGG19Trunk, "mobilenet": MobileNetTrunk}[trunk]
    trunk_mod = trunk_cls(dtype=dtype)
    spec1 = ((128, 3), (128, 3), (128, 3), (512, 1))
    paf1_mod = _CPMBranch(spec1, 2 * num_limbs, 1, dtype, act="relu", norm=False)
    heat1_mod = _CPMBranch(spec1, num_parts + 1, 1, dtype, act="relu", norm=False)

    def _sub(coll_tree, key):
        return {"params": coll_tree["params"][key],
                **({"batch_stats": coll_tree["batch_stats"][key]}
                   if coll_tree.get("batch_stats") and
                   key in coll_tree["batch_stats"] else {})}

    def step(state, batch):
        def loss_fn(params):
            tree = {"params": params["front"]}
            if state.batch_stats is not None:
                tree["batch_stats"] = state.batch_stats["front"]
            feat = trunk_mod.apply(_sub(tree, "trunk"), batch["image"],
                                   train=False)
            paf1 = paf1_mod.apply(_sub(tree, "stage1_paf"), feat, train=False)
            heat1 = heat1_mod.apply(_sub(tree, "stage1_heat"), feat, train=False)
            svars = {"params": params["stages"]}
            if state.batch_stats is not None and state.batch_stats["stages"]:
                svars["batch_stats"] = state.batch_stats["stages"]
            saved = vgg_pipeline_stages(
                mesh, svars, paf1, heat1, feat, n_micro,
                num_parts=num_parts, num_limbs=num_limbs, dtype=dtype,
            )
            loss, logs = rtpose_light_loss(
                saved, batch["heat"], batch["paf"], num_stages
            )
            return loss, logs

        (loss, logs), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        state = state.apply_gradients(grads=grads)
        logs["loss"] = loss
        return state, logs

    return step


def make_pipeline_train_step(stem_module, stage_def: CPMStageUniform,
                             mesh: Mesh, n_micro: int):
    """Pipelined rtpose_light3d train step over a ("data", "pipe") mesh.

    params = {"stem": stem params (replicated), "stages": stacked stage
    params (pipe-sharded leading axis)}; same split for batch_stats.
    BatchNorm uses running stats inside the pipeline (microbatch-BN is the
    standard GPipe caveat; the stem, running on the full local batch, could
    train its BN but is kept consistent) — fine-tuning / capability-proof
    semantics, pinned against the sequential eval-mode model in
    tests/test_pipeline.py.
    """
    from popnet_tpu.losses.losses import rtpose_light3d_loss

    def step(state, batch):
        def loss_fn(params):
            stem_vars = {"params": params["stem"]}
            if state.batch_stats is not None:
                stem_vars["batch_stats"] = state.batch_stats["stem"]
            stem_out = stem_module.apply(stem_vars, batch["image"], train=False)
            svars = {"params": params["stages"]}
            if state.batch_stats is not None:
                svars["batch_stats"] = state.batch_stats["stages"]
            saved = pipeline_stages(
                mesh, svars, stem_out, n_micro,
                num_parts=stage_def.num_parts, num_limbs=stage_def.num_limbs,
                dtype=stage_def.dtype,
            )
            loss, logs = rtpose_light3d_loss(
                saved, batch["heatmaps"], batch["pafs"], batch["zmaps"],
                num_stages=len(saved) // 3,
            )
            return loss, logs

        (loss, logs), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        state = state.apply_gradients(grads=grads)
        logs["loss"] = loss
        return state, logs

    return step


def state_shardings(state, mesh: Mesh, pipe_axis: str = "pipe"):
    """Per-leaf NamedSharding pytree for the pipelined TrainState: every
    leaf under a "stages" key (params, batch stats, AND the optimizer
    moments that mirror them) is sharded on its stacked leading axis over
    the pipe; everything else (stem, scalars) is replicated."""
    repl = NamedSharding(mesh, P())
    pipe0 = NamedSharding(mesh, P(pipe_axis))

    def rule(path, leaf):
        in_stages = any(
            getattr(k, "key", getattr(k, "name", None)) == "stages"
            for k in path
        )
        if in_stages and getattr(leaf, "ndim", 0) >= 1:
            return pipe0
        return repl

    return jax.tree_util.tree_map_with_path(rule, state)


def shard_pipeline_state(state, mesh: Mesh, pipe_axis: str = "pipe"):
    """Device-put the pipelined TrainState onto the mesh (host-side twin of
    jit_pipeline_step's in_shardings)."""
    sh = state_shardings(state, mesh, pipe_axis)
    return jax.tree.map(jax.device_put, state, sh)


def jit_pipeline_step(step, mesh: Mesh, state, data_axis: str = "data",
                      pipe_axis: str = "pipe"):
    """Jit a pipelined train step: stage stacks pipe-sharded, stem
    replicated, batch data-sharded; in/out state shardings identical so the
    input state buffer donates."""
    st_sh = state_shardings(state, mesh, pipe_axis)
    bsh = NamedSharding(mesh, P(data_axis))
    repl = NamedSharding(mesh, P())
    return jax.jit(
        step,
        in_shardings=(st_sh, bsh),
        out_shardings=(st_sh, repl),
        donate_argnums=(0,),
    )
