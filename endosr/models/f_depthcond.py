"""F_Model_depthCond — the flagship training wrapper (``sftmd_depthCond``).

Twin of ``codes/models/F_model_depthCond.py``: DepthNet generator, L1/L2/CB
pixel loss plus five gated losses (depth, VGG, SSIM, static mask, dynamic
depth-mask with trainable softmax weights learned by the same Adam), cosine-
restart schedule, the two-file checkpoint scheme, and the 8-way
self-ensemble ``test_x8``.

TPU shape: one jitted SPMD train step over the data mesh — forward, all
gated losses, grad, Adam — with the batch sharded on its leading axis and
parameters replicated; XLA inserts the gradient all-reduce (the DDP
equivalent). The dynamic-loss trainable weights live in the same param
pytree as the generator, mirroring the reference appending them to
optimizer_G (``F_model_depthCond.py:94-98``).
"""

from __future__ import annotations

import logging

import jax
import jax.numpy as jnp
import numpy as np
import optax

from endosr.losses.basic import pixel_loss
from endosr.losses.mask import dynamic_weight_mask_loss, mask_loss
from endosr.losses.ssim import ssim_value
from endosr.models.base import BaseModel, TrainState
from endosr.nn import networks
from endosr.ops.masks import pool_mask_np
from endosr.parallel.mesh import get_mesh, replicate, shard_batch

logger = logging.getLogger("base")

__all__ = ["FModelDepthCond"]


# all 256 correctly-rounded u8/255 values, divided on the HOST — XLA lowers
# an in-graph /255 to multiply-by-reciprocal, which is 1 ulp off for some
# codes; the table gather keeps the u8 pipeline bit-identical to read_img
_U8_TABLE = np.arange(256, dtype=np.float32) / 255.0


def _u8_image_norm(x):
    """Device twin of the host decode normalization (``util.read_img``):
    uint8 → fp32 [0,1], bit-exact via a 256-entry constant table."""
    if x.dtype == jnp.uint8:
        return jnp.asarray(_U8_TABLE)[x.astype(jnp.int32)]
    return x


def _u8_cast(x):
    """0/1-valued uint8 masks → fp32 (no scaling)."""
    if x.dtype == jnp.uint8:
        return x.astype(jnp.float32)
    return x


def _chunked_serving_fn(netG, p, chunk):
    """Serving forward that splits batches > ``chunk`` into ``chunk``-sized
    sub-forwards inside ONE jitted program (exact: every op in the network
    is per-sample, so a batch split + concat is the identical math).

    Why: the b≤8 Pallas kernels (head_dot, style_blend, packed chains) are
    where the serving speed lives — bs16 through one b=16 program drops
    them all (328 → 271 fps/chip measured, round 3) while two chained b=8
    sub-forwards keep them. bs8 is the certified per-chip optimum
    (BASELINE.md batch sweep), so larger serving batches default to
    chunked execution; ``serve_batch_chunk: 0`` disables.
    """

    def fwd(lq, d, m):
        b = lq.shape[0]
        if chunk and b > chunk:
            # floor(b/chunk) full chunks + one ragged remainder (exact —
            # every op is per-sample). A non-multiple batch previously fell
            # through as ONE b-sized program and silently dropped every
            # b≤chunk Pallas kernel (ADVICE r4).
            outs = [
                netG.apply({"params": p}, lq[i:i + chunk],
                           d[i:i + chunk], m[i:i + chunk])
                for i in range(0, b, chunk)
            ]
            return jnp.concatenate(outs, axis=0)
        return netG.apply({"params": p}, lq, d, m)

    return fwd


class FModelDepthCond(BaseModel):
    def __init__(self, opt, mesh=None):
        super().__init__(opt)
        self.mesh = mesh or get_mesh()
        # precision: None/fp32 (reference-faithful), "bf16" (full bf16
        # compute, quality-certified at ×4/×8), "mixed" (fp32 trunk + bf16
        # hoisted SEAN branches), "bf16c" (1-pass mean-compensated bf16
        # stream convs + bf16 branches + fp32 residual stream), or "bf16c3"
        # (3-pass centered convs — ≥50 dB certified at ×2/×3 where full
        # bf16 fails the quality budget; see tests/test_bf16_quality.py and
        # layers.centered_conv)
        precision = opt.get("precision")
        compute_dtype = jnp.bfloat16 if precision == "bf16" else jnp.float32
        mod_dtype = (jnp.bfloat16
                     if precision in ("mixed", "bf16c", "bf16c3") else None)
        self.netG = networks.define_G(
            opt, dtype=compute_dtype, modulation_dtype=mod_dtype,
            centered_convs={"bf16c": 1, "bf16c3": 3}.get(precision, 0))

        ds = (opt.get("datasets") or {}).get("train") or (opt.get("datasets") or {}).get(
            "test"
        ) or {}
        self.mask_num = ds.get("depthMaskNum") or 10
        lr_size = ds.get("LR_size") or 32
        seed = 0
        if opt.get("train") and opt["train"].get("manual_seed") is not None:
            seed = int(opt["train"]["manual_seed"])
        self._np_rng = np.random.default_rng(seed)

        # init params on a tiny dummy batch (shapes are polymorphic per
        # call, and the net is fully convolutional so param shapes don't
        # depend on H/W — cap the dummy at 32² so model construction
        # doesn't compile/execute a full-size forward just to init)
        key = jax.random.PRNGKey(seed)
        init_size = min(lr_size, 32)
        dummy = (
            jnp.zeros((1, init_size, init_size, opt["network_G"].get("in_nc", 3)), jnp.float32),
            jnp.zeros((1, init_size, init_size, 1), jnp.float32),
            jnp.zeros((1, init_size, init_size, self.mask_num), jnp.float32),
        )
        g_params = self.netG.init(key, *dummy)["params"]

        params = {"netG": g_params}

        if self.is_train:
            t = opt["train"]
            self.cri_pix = pixel_loss(t["pixel_criterion"])
            self.l_pix_w = float(t["pixel_weight"])

            self.use_depth_loss = bool((t.get("depth_loss") or {}).get("use_depth_criterion"))
            self.use_vgg_loss = bool((t.get("vgg_loss") or {}).get("use_vgg_criterion"))
            self.use_ssim_loss = bool((t.get("ssim_loss") or {}).get("use_ssim_criterion"))
            self.use_mask_loss = bool((t.get("mask_loss") or {}).get("use_mask_criterion"))
            self.use_dynamic_loss = bool(
                (t.get("dynamic_loss") or {}).get("use_dynamic_criterion")
            )
            self.l_ssim_w = float((t.get("ssim_loss") or {}).get("ssim_weight") or 1.0)
            self.mask_criterion = (t.get("mask_loss") or {}).get("mask_criterion", "smoothl1")
            self.l_mask_w = float((t.get("mask_loss") or {}).get("mask_weight") or 1.0)
            self.dyn_criterion = (t.get("dynamic_loss") or {}).get(
                "dynamic_criterion", "smoothl1"
            )
            self.l_dyn_w = float((t.get("dynamic_loss") or {}).get("dynamic_weight") or 1.0)

            if self.use_dynamic_loss:
                params["dyn"] = {
                    "trainable_weight": jnp.ones((self.mask_num,), jnp.float32)
                }

            self.depth_loss_fn = None
            if self.use_depth_loss:
                from endosr.losses.depth import DepthEstimatorLoss

                self.depth_loss_fn = DepthEstimatorLoss(t["depth_loss"])
            self.vgg_loss_fn = None
            if self.use_vgg_loss:
                from endosr.losses.perceptual import VGGDepthLoss

                self.vgg_loss_fn = VGGDepthLoss(t["vgg_loss"])

            wd = float(t.get("weight_decay_G") or 0)
            chain = []
            if wd:
                chain.append(optax.add_decayed_weights(wd))
            adam = optax.scale_by_adam(
                b1=float(t.get("beta1", 0.9)), b2=float(t.get("beta2", 0.999))
            )
            if (t.get("lr_scheme") == "MultiStepLR_Restart"
                    and t.get("clear_state") and t.get("restarts")):
                # reference lr_scheduler.py:22-23 — wipe Adam moments at
                # each restart step
                from endosr.models.lr_schedule import clear_state_at

                adam = clear_state_at(t["restarts"])(adam)
            chain.append(adam)
            chain.append(optax.scale_by_learning_rate(self.schedule))
            self.tx = optax.chain(*chain)
            opt_state = self.tx.init(params)
        else:
            self.tx = None
            opt_state = ()

        self.state = TrainState(
            step=jnp.asarray(0, jnp.int32), params=params, opt_state=opt_state
        )
        self.load()
        self.state = self.state.replace(params=replicate(self.state.params, self.mesh))
        if self.is_train:
            self.state = self.state.replace(
                opt_state=replicate(self.state.opt_state, self.mesh)
            )

        self._train_step = self._build_train_step() if self.is_train else None
        self._serving_params = None
        self._apply_jit = None
        self._apply_bucket_jit = None
        self._param_apply_jit = None
        self._param_bucket_jit = None
        self._spatial_jits = {}
        self.log_dict = {}

    def _refresh_serving_jits(self):
        """(Re)build the serving jits.

        Pure serving (``is_train`` False): the CURRENT weights are closed
        over as compile-time constants — serving never re-prepares weights
        per frame; with params as constants, XLA folds the weight-norm
        normalizations, the packed-kernel builds and the bias tiles at
        compile time (round-3 profile: ~2.5 ms/step of per-call weight
        prep at the ×8 flagship shape). Re-traced only when the loaded
        params object changes (e.g. after ``load()`` or a state swap).

        Training (validation calls during the loop): every optimizer step
        produces a NEW params object, so constant-folding would recompile
        the full validation program each round (and could serve stale
        weights after an in-place pytree mutation). Here params stay a
        traced jit ARGUMENT — one compile per shape for the whole run.
        """
        if self.is_train:
            if self._param_apply_jit is None:
                self._param_apply_jit = jax.jit(
                    lambda p, lq, d, m: self.netG.apply(
                        {"params": p}, lq, d, m))
                self._param_bucket_jit = jax.jit(
                    lambda p, lq, d, m, pmk, hv, wv: self.netG.apply(
                        {"params": p}, lq, d, m, valid_hw=(hv, wv),
                        pool_mask=pmk))
            import functools

            p = self.state.params["netG"]
            self._apply_jit = functools.partial(self._param_apply_jit, p)
            self._apply_bucket_jit = functools.partial(
                self._param_bucket_jit, p)
            return
        p = self.state.params["netG"]
        if self._serving_params is p:
            return
        self._serving_params = p
        chunk = self.opt.get("serve_batch_chunk")
        chunk = 8 if chunk is None else int(chunk)
        self._apply_jit = jax.jit(_chunked_serving_fn(self.netG, p, chunk))
        self._apply_bucket_jit = jax.jit(
            lambda lq, d, m, pmk, hv, wv: self.netG.apply(
                {"params": p}, lq, d, m, valid_hw=(hv, wv), pool_mask=pmk))

    # ------------------------------------------------------------------
    def _build_train_step(self):
        # Program specialization: the fused Pallas output stage loses to
        # XLA's shuffle+convert in the ×8 inference program (33.5 vs
        # 37.1 ms) but wins inside the training program (bf16 step 127.0
        # vs 135.9 ms) — so the train step gets its own module clone with
        # the kernel forced on, while test()/serving keep the
        # inference-optimal default. Params are identical either way.
        netG = self.netG
        if hasattr(netG, "pallas_output"):
            netG = netG.clone(pallas_output=True)

        def loss_fn(params, batch):
            # u8_pipeline: images ship as uint8 (4x less host/H2D traffic)
            # and are normalized here with the identical astype(f32)/255 the
            # host decode uses; masks are 0/1-valued so they only cast.
            lq = _u8_image_norm(batch["LQ"])
            masks = _u8_cast(batch["DepthMaskList"])
            fake_h = netG.apply(
                {"params": params["netG"]}, lq, batch["Depth"], masks,
            )
            gt = _u8_image_norm(batch["GT"])
            logs = {}
            l_pix = self.l_pix_w * self.cri_pix(fake_h, gt)
            total = l_pix
            logs["l_pix"] = l_pix

            if self.use_depth_loss:
                l_depth, l_depth_list, _, _ = self.depth_loss_fn(fake_h, gt)
                total = total + l_depth
                logs["l_depth"] = l_depth
                for i, l in enumerate(l_depth_list):
                    logs[f"l_depth_{i}"] = l
            if self.use_vgg_loss:
                l_vgg, l_vgg_list = self.vgg_loss_fn(fake_h, gt)
                total = total + l_vgg
                logs["l_vgg"] = l_vgg
                for i, l in enumerate(l_vgg_list):
                    logs[f"l_vgg_{i}"] = l
            if self.use_ssim_loss:
                # reference adds w·SSIM directly (``F_model_depthCond.py:178-180``)
                l_ssim = self.l_ssim_w * ssim_value(fake_h, gt)
                total = total + l_ssim
                logs["l_ssim"] = l_ssim
            if self.use_mask_loss:
                l_mask = mask_loss(
                    fake_h, gt, masks, batch["mask_bin"],
                    self.mask_criterion, self.l_mask_w,
                )
                total = total + l_mask
                logs["l_mask"] = l_mask
            if self.use_dynamic_loss:
                raw, _, l_dyn, w = dynamic_weight_mask_loss(
                    fake_h, gt, masks,
                    params["dyn"]["trainable_weight"],
                    self.dyn_criterion, self.l_dyn_w,
                )
                total = total + l_dyn
                logs["l_dynamic"] = l_dyn
                logs["dyn_w"] = w
                logs["dyn_l"] = raw

            logs["l_all"] = total
            return total, logs

        def train_step(state: TrainState, batch):
            grads, logs = jax.grad(loss_fn, has_aux=True)(state.params, batch)
            updates, opt_state = self.tx.update(grads, state.opt_state, state.params)
            params = optax.apply_updates(state.params, updates)
            return (
                TrainState(step=state.step + 1, params=params, opt_state=opt_state),
                logs,
            )

        return jax.jit(train_step, donate_argnums=(0,))

    # ------------------------------------------------------------------
    # reference contract
    # ------------------------------------------------------------------
    def feed_data(self, data):
        import jax as _jax

        def cvt(x):
            # keep device arrays (e.g. from prefetch_to_device) on device;
            # keep uint8 (u8_pipeline) for the in-step device normalization
            if isinstance(x, _jax.Array):
                return x
            x = np.asarray(x)
            return x if x.dtype == np.uint8 else np.asarray(x, np.float32)

        self.batch = {k: cvt(data[k])
                      for k in ("LQ", "GT", "Depth", "DepthMaskList")
                      if k in data}

    def optimize_parameters(self, step=None):
        batch = dict(self.batch)
        # host RNG picks the random mask bin (reference ``mask_loss.py:24``)
        batch["mask_bin"] = np.int32(self._np_rng.integers(0, self.mask_num))
        batch = shard_batch(batch, self.mesh)
        if (self.use_depth_loss and step is not None and step % 1000 == 0):
            # disparity-dump debug hook (``F_model_depthCond.py:202-207``):
            # every 1000 steps save the 4-scale SR/HR disparity pyramids to
            # ./tmp/{sr,hr}_<i>.npy. Runs outside the donated train step —
            # one extra jitted forward+depth pass every 1000 steps.
            self._dump_disparities(batch)
        self.state, logs = self._train_step(self.state, batch)
        logs = jax.device_get(logs)
        self.log_dict = {}
        for k, v in logs.items():
            if k == "dyn_w":
                for i, x in enumerate(np.asarray(v)):
                    self.log_dict[f"dyn_w_{i}"] = float(x)
            elif k == "dyn_l":
                for i, x in enumerate(np.asarray(v)):
                    self.log_dict[f"dyn_l_{i}"] = float(x)
            else:
                self.log_dict[k] = float(v)

    def _dump_disparities(self, batch):
        import os

        if getattr(self, "_disp_fn", None) is None:
            netG = self.netG

            def disp(params, lq, dep, masks, gt):
                fake_h = netG.apply({"params": params}, _u8_image_norm(lq),
                                    dep, _u8_cast(masks))
                return (self.depth_loss_fn.get_depth_feature(fake_h),
                        self.depth_loss_fn.get_depth_feature(gt))

            self._disp_fn = jax.jit(disp)
        sr_disp, hr_disp = jax.device_get(self._disp_fn(
            self.state.params["netG"], batch["LQ"], batch["Depth"],
            batch["DepthMaskList"], batch["GT"]))
        if self.rank == 0:
            logger.info("Saving the depth map for SR and HR images......")
            os.makedirs("./tmp", exist_ok=True)
            for i in range(4):
                np.save(f"./tmp/sr_{i}.npy", np.asarray(sr_disp[i]))
                np.save(f"./tmp/hr_{i}.npy", np.asarray(hr_disp[i]))

    def _spatial_bucket_apply(self, n):
        """Bucketed-eval forward H-sharded over an ``n``-device mesh.

        The serving-surface route into ``endosr/parallel/spatial.py``'s
        layout (YAML ``spatial_shard: N``): inputs padded to the bucket
        shape carry ``P(None, 'data')`` on H, params are replicated (and
        stay a traced argument — the spatial path exists to FIT a program,
        not to peak it, so no weight constant-folding), and XLA's SPMD
        partitioner inserts the conv halo exchanges and the psums behind
        the valid-masked InstanceNorm statistics. Use case: whole-image
        shapes whose one-chip program OOMs — the ×2 512² fp32 case
        (BASELINE.md) that the reference evals on one GPU
        (``codes/test.py:62-137``).
        """
        if self._spatial_jits.get(n) is None:
            import jax as _jax
            from jax.sharding import NamedSharding, PartitionSpec as P

            from endosr.parallel.mesh import make_mesh

            devs = _jax.devices()
            if len(devs) < n:
                raise ValueError(
                    f"spatial_shard: {n} needs {n} devices, have {len(devs)}")
            mesh = make_mesh(devs[:n])
            s = NamedSharding(mesh, P(None, "data"))
            rep = NamedSharding(mesh, P())
            self._spatial_jits[n] = jax.jit(
                lambda p, lq, d, m, pmk, hv, wv: self.netG.apply(
                    {"params": p}, lq, d, m, valid_hw=(hv, wv),
                    pool_mask=pmk),
                in_shardings=(rep, s, s, s, s, rep, rep),
                out_shardings=s,
            )
            logger.warning(
                "spatial_shard: whole-image eval runs H-sharded over %d "
                "devices (halo exchanges + masked-IN psums over ICI)", n)
        fn = self._spatial_jits[n]
        p = self.state.params["netG"]
        return lambda *args: fn(p, *args)

    def test(self):
        b = self.batch
        lq, dep, masks = b["LQ"], b["Depth"], b["DepthMaskList"]
        # Optional shape bucketing: whole-image eval sees a new input shape
        # per image (reference modcrops per image, ``EndoScene_depth_dataset``)
        # and each shape costs one XLA compile. With ``eval_bucket_multiple``
        # set, inputs are ZERO-padded up to the next multiple and the network
        # runs its exact valid-masked path (``DepthNet.__call__(valid_hw=…)``):
        # every stream is re-zeroed at the true image border before each conv
        # (implicit SAME padding lands where the unpadded net puts it),
        # InstanceNorm statistics cover the valid region only, and the style
        # pooling uses the host-precomputed mask (``ops.masks.pool_mask_np``).
        # The cropped output matches the per-shape compile to fp32
        # reduction-order noise (tests/test_eval_buckets.py), so all images
        # in a bucket share ONE compiled program. Exact ⇒ ON by default
        # (32); set ``eval_bucket_multiple: 0`` to force per-shape compiles.
        bucket = self.opt.get("eval_bucket_multiple")
        bucket = 32 if bucket is None else int(bucket)
        # the masked program supports the standard DepthNet paths only:
        # ablations / Pallas fused epilogue are rejected by DepthNet, and
        # the centered bf16c modes' mean compensation is certified on the
        # unpadded geometry — those fall back to per-shape compiles
        if bucket and (getattr(self.netG, "ablate_depth_matrix", False)
                       or getattr(self.netG, "ablate_depth_block", False)
                       or getattr(self.netG, "fused_epilogue", False)
                       or getattr(self.netG, "centered_convs", 0)):
            bucket = 0
            if not getattr(self, "_warned_bucket_fallback", False):
                self._warned_bucket_fallback = True
                logger.warning(
                    "eval bucketing disabled for this network config "
                    "(ablation / fused epilogue / centered bf16c): falling "
                    "back to one XLA compile per input shape")
        # Optional spatial (H) sharding for whole-image shapes that OOM one
        # chip (YAML ``spatial_shard: N`` — e.g. ×2 512² fp32). Runs on the
        # exact bucketed path: the bucket multiple is raised to lcm(bucket,
        # 4·N) so padded H divides the mesh with ≥4 rows per shard (the
        # ``endosr/parallel/spatial.py`` min-rows guard — below that XLA's
        # nearest-neighbor halo exchange corrupts stride-2 convs).
        nsp = int(self.opt.get("spatial_shard") or 0)
        if nsp > 1 and not bucket:
            nsp = 0
            if not getattr(self, "_warned_spatial_fallback", False):
                self._warned_spatial_fallback = True
                logger.warning(
                    "spatial_shard ignored: it requires the exact bucketed "
                    "eval path, which is disabled for this network config "
                    "(ablation / fused epilogue / centered bf16c)")
        h, w = lq.shape[1], lq.shape[2]
        if bucket:
            bucket = -(-bucket // 4) * 4  # masked path needs H,W % 4 == 0
            hmult = int(np.lcm(bucket, 4 * nsp)) if nsp > 1 else bucket
            hb = -(-h // hmult) * hmult
            wb = -(-w // bucket) * bucket
            pad = ((0, 0), (0, hb - h), (0, wb - w), (0, 0))
            lqp = np.pad(lq, pad)
            depp = np.pad(dep, pad)
            maskp = np.pad(masks, pad)
            v2h, v2w = (h + 1) // 2, (w + 1) // 2
            v3h, v3w = (v2h + 1) // 2, (v2w + 1) // 2
            pm = pool_mask_np(np.asarray(masks), (v3h, v3w),
                              (hb // 4, wb // 4))
            if nsp > 1:
                apply_fn = self._spatial_bucket_apply(nsp)
                sr = np.asarray(jax.device_get(apply_fn(
                    lqp, depp, maskp, pm, np.int32(h), np.int32(w))))
            else:
                self._refresh_serving_jits()
                sr = np.asarray(self._apply_bucket_jit(
                    lqp, depp, maskp, pm, np.int32(h), np.int32(w)))
        else:
            self._refresh_serving_jits()
            sr = np.asarray(self._apply_jit(lq, dep, masks))
        s = self.opt["scale"]
        self.fake_SR = sr[:, : h * s, : w * s, :]
        self.fake_H = self.fake_SR

    def test_x8(self):
        """8-way flip/transpose self-ensemble (``F_model_depthCond.py:236-270``).

        The reference forgets to transform/pass the depth inputs (it calls
        ``netG(aug)`` — a latent crash for DepthNet); here the depth map and
        masks are transformed alongside the image. Each transform runs
        through ``test()`` — with the default exact bucketing, all 8 views
        (and every image in the set) share at most two compiled programs
        (one per transpose orientation, and only one when the bucketed
        H and W coincide).
        """

        def tf(x, op):
            if op == "v":
                return x[:, :, ::-1, :]
            if op == "h":
                return x[:, ::-1, :, :]
            return x.transpose(0, 2, 1, 3)

        b = self.batch
        triples = [(b["LQ"], b["Depth"], b["DepthMaskList"])]
        for op in ("v", "h", "t"):
            triples.extend(
                [(tf(l, op), tf(d, op), tf(m, op)) for (l, d, m) in triples]
            )
        outs = []
        saved = self.batch
        for i, (l, d, m) in enumerate(triples):
            self.batch = {
                "LQ": np.ascontiguousarray(l),
                "Depth": np.ascontiguousarray(d),
                "DepthMaskList": np.ascontiguousarray(m),
            }
            self.test()
            sr = self.fake_SR
            if i > 3:
                sr = tf(sr, "t")
            if i % 4 > 1:
                sr = tf(sr, "h")
            if (i % 4) % 2 == 1:
                sr = tf(sr, "v")
            outs.append(sr)
        self.batch = saved
        self.fake_H = np.mean(np.stack(outs), axis=0)
        self.fake_SR = self.fake_H

    def get_current_visuals(self):
        out = {
            "LQ": self.batch["LQ"][0],
            "SR": self.fake_SR[0],
            "Batch_SR": self.fake_SR,
            "Depth": self.batch["Depth"][0],
        }
        if "GT" in self.batch:
            out["GT"] = self.batch["GT"][0]
        return out

    def print_network(self):
        s, n = self.get_network_description(self.state.params["netG"])
        if self.rank <= 0:
            logger.info(
                "Network G structure: %s, with parameters: %,d"
                .replace("%,d", f"{n:,d}"), self.netG.__class__.__name__,
            )

    def load(self):
        load_path_g = self.opt["path"].get("pretrain_model_G")
        if load_path_g:
            logger.info("Loading model for G [%s] ...", load_path_g)
            strict = self.opt["path"].get("strict_load", True)
            g = self.load_network(load_path_g, self.state.params["netG"], strict)
            params = dict(self.state.params)
            params["netG"] = g
            self.state = self.state.replace(params=params)

    def save(self, iter_label):
        self.save_network(self.state.params["netG"], "G", iter_label)
