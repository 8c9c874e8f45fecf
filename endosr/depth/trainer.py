"""Self-supervised monodepth trainer — twin of ``codes/depth_estimation/trainer.py``.

The monodepth2 recipe on endoscopy video: depth encoder/decoder + pose
encoder/decoder trained by view synthesis with min-reprojection +
auto-masking + edge-aware smoothness (``trainer.py:218-246, 248-302,
325-480``).

TPU shape: the whole step — both network forwards for 3 frames, the
per-scale backproject→project→grid-sample warps, the min-reprojection loss,
and Adam — is ONE jitted SPMD program. The per-scale geometry modules the
reference instantiates (``BackprojectDepth``/``Project3D``) are pure
functions here; the tie-break noise uses an explicit PRNG key.

Supported config (the endovis defaults): monocular frame_ids [0,-1,1],
``separate_resnet`` or ``posecnn`` pose, automasking on/off, avg/min
reprojection, SSIM on/off, v1_multiscale on/off, and stereo training
(``use_stereo`` appends the 's' frame whose camera transform comes from the
dataset's ``stereo_T``; stereo-only [0,'s'] runs without pose networks —
``trainer.py:49-52,296-302``).
"""

from __future__ import annotations

import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from endosr.depth.layers import (
    backproject_depth,
    disp_to_depth,
    get_smooth_loss,
    grid_sample,
    project_3d,
    ssim_monodepth,
    transformation_from_parameters,
)
from endosr.models.lr_schedule import step_lr
from endosr.nn.monodepth import DepthDecoder, PoseCNN, PoseDecoder, ResnetEncoder
from endosr.ops.resize import interpolate_bilinear
from endosr.utils.checkpoint import load_pytree, save_pytree

__all__ = ["Trainer", "monodepth_loss"]


def _enc_key(k):
    """Reference-style tuple keys → strings: jit pytree dict keys must be
    sortable, and stereo mixes int and 's' frame ids inside the tuples."""
    return k if isinstance(k, str) else "|".join(str(x) for x in k)


class _Inputs:
    """Tuple-key view over a string-keyed inputs dict."""

    def __init__(self, d):
        self._d = d

    def __getitem__(self, k):
        return self._d[_enc_key(k)]

    def __contains__(self, k):
        return _enc_key(k) in self._d


def encode_inputs(inputs: dict) -> dict:
    return {_enc_key(k): v for k, v in inputs.items()}


def monodepth_loss(variables, nets, inputs, opt, rng, train: bool = True):
    """Compute outputs + losses for one batch (pure function).

    inputs: dict with keys
      ('color', f, s) NHWC for f in frame_ids, s in scales ∪ {0}
      ('color_aug', f, 0), ('K', 0) [B,4,4], ('inv_K', 0)
    """
    if not isinstance(inputs, _Inputs):
        inputs = _Inputs(encode_inputs(inputs) if any(
            not isinstance(k, str) for k in inputs) else inputs)
    frame_ids = tuple(opt["frame_ids"])
    scales = tuple(opt["scales"])
    height, width = opt["height"], opt["width"]
    enc, dec, pose_enc, pose_dec = nets

    mutable = ["batch_stats"] if train else False

    def run_encoder(name, net, x):
        if train:
            feats, _ = net.apply(variables[name], x, train=True,
                                 mutable=["batch_stats"])
            return feats
        return net.apply(variables[name], x, train=False)

    feats = run_encoder("encoder", enc, inputs[("color_aug", 0, 0)])
    outputs = dict(dec.apply(variables["depth"], feats))

    # poses: pairwise, temporal order preserved (``trainer.py:259-279``);
    # the stereo frame's "pose" is the fixed rig extrinsic from the dataset
    # (``trainer.py:296-302``, ``mono_dataset.py:193-198``)
    for f_i in frame_ids[1:]:
        if f_i == "s":
            outputs[("cam_T_cam", 0, "s")] = inputs["stereo_T"]
            continue
        if f_i < 0:
            pair = [inputs[("color_aug", f_i, 0)], inputs[("color_aug", 0, 0)]]
        else:
            pair = [inputs[("color_aug", 0, 0)], inputs[("color_aug", f_i, 0)]]
        stacked = jnp.concatenate(pair, axis=-1)
        if opt.get("pose_model_type", "separate_resnet") == "posecnn":
            axisangle, translation = pose_dec.apply(variables["pose"], stacked)
        else:
            pf = run_encoder("pose_encoder", pose_enc, stacked)
            axisangle, translation = pose_dec.apply(variables["pose"], [pf])
        outputs[("axisangle", 0, f_i)] = axisangle
        outputs[("translation", 0, f_i)] = translation
        outputs[("cam_T_cam", 0, f_i)] = transformation_from_parameters(
            axisangle[:, 0], translation[:, 0], invert=(f_i < 0)
        )

    # view synthesis (``generate_images_pred``)
    for scale in scales:
        disp = outputs[("disp", scale)]
        if opt.get("v1_multiscale"):
            source_scale = scale
        else:
            disp = interpolate_bilinear(disp, (height, width),
                                        align_corners=False)
            source_scale = 0
        _, depth = disp_to_depth(disp, opt["min_depth"], opt["max_depth"])
        outputs[("depth", 0, scale)] = depth
        h_s = height // (2 ** source_scale)
        w_s = width // (2 ** source_scale)
        for f_i in frame_ids[1:]:
            t_mat = outputs[("cam_T_cam", 0, f_i)]
            cam_points = backproject_depth(depth, inputs[("inv_K", source_scale)])
            pix = project_3d(cam_points, inputs[("K", source_scale)], t_mat,
                             h_s, w_s)
            outputs[("color", f_i, scale)] = grid_sample(
                inputs[("color", f_i, source_scale)], pix)

    # losses (``compute_losses``)
    def reprojection(pred, target):
        l1 = jnp.mean(jnp.abs(target - pred), axis=-1, keepdims=True)
        if opt.get("no_ssim"):
            return l1
        ssim = jnp.mean(ssim_monodepth(pred, target), axis=-1, keepdims=True)
        return 0.85 * ssim + 0.15 * l1

    losses = {}
    total_loss = 0.0
    for scale in scales:
        source_scale = scale if opt.get("v1_multiscale") else 0
        disp = outputs[("disp", scale)]
        color = inputs[("color", 0, scale)]
        target = inputs[("color", 0, source_scale)]

        reproj = jnp.concatenate(
            [reprojection(outputs[("color", f_i, scale)], target)
             for f_i in frame_ids[1:]], axis=-1)

        if not opt.get("disable_automasking"):
            ident = jnp.concatenate(
                [reprojection(inputs[("color", f_i, source_scale)], target)
                 for f_i in frame_ids[1:]], axis=-1)
            rng, sub = jax.random.split(rng)
            ident = ident + jax.random.normal(sub, ident.shape) * 1e-5
        if opt.get("avg_reprojection"):
            reproj = jnp.mean(reproj, axis=-1, keepdims=True)
            if not opt.get("disable_automasking"):
                ident = jnp.mean(ident, axis=-1, keepdims=True)
        if opt.get("disable_automasking"):
            combined = reproj
        else:
            combined = jnp.concatenate([ident, reproj], axis=-1)
        to_optimise = (combined[..., 0] if combined.shape[-1] == 1
                       else jnp.min(combined, axis=-1))
        loss = jnp.mean(to_optimise)

        mean_disp = jnp.mean(disp, axis=(1, 2), keepdims=True)
        norm_disp = disp / (mean_disp + 1e-7)
        smooth = get_smooth_loss(norm_disp, color)
        loss = loss + opt["disparity_smoothness"] * smooth / (2 ** scale)
        total_loss += loss
        losses[f"loss/{scale}"] = loss

    total_loss = total_loss / len(scales)
    losses["loss"] = total_loss
    return total_loss, (losses, outputs)


class Trainer:
    def __init__(self, options, dataset=None, val_dataset=None):
        self.opt = options
        o = options
        self.log_path = os.path.join(o.log_dir, o.model_name)
        os.makedirs(self.log_path, exist_ok=True)

        assert o.frame_ids[0] == 0, "frame_ids must start with 0"
        # use_stereo appends the 's' frame; stereo-only training ([0] + 's')
        # needs no pose networks (``trainer.py:49-52``)
        self.frame_ids = [f for f in o.frame_ids if f != "s"]
        use_stereo = bool(getattr(o, "use_stereo", False) or "s" in o.frame_ids)
        if use_stereo:
            self.frame_ids.append("s")
        self.use_stereo = use_stereo
        self.use_pose_net = not (use_stereo and self.frame_ids == [0, "s"])

        self.encoder = ResnetEncoder(num_layers=o.num_layers)
        self.depth = DepthDecoder(
            num_ch_enc=tuple(self.encoder.num_ch_enc), scales=tuple(o.scales))
        self.pose_encoder = self.pose = None
        if self.use_pose_net:
            if o.pose_model_type == "posecnn":
                self.pose = PoseCNN(num_input_frames=2)
            else:
                self.pose_encoder = ResnetEncoder(
                    num_layers=o.num_layers, num_input_images=2)
                self.pose = PoseDecoder(
                    num_ch_enc=tuple(self.pose_encoder.num_ch_enc),
                    num_input_features=1, num_frames_to_predict_for=2)

        key = jax.random.PRNGKey(0)
        dummy = jnp.zeros((1, o.height, o.width, 3), jnp.float32)
        self.variables = {}
        self.variables["encoder"] = self.encoder.init(key, dummy, train=True)
        feats = self.encoder.apply(self.variables["encoder"], dummy,
                                   train=True, mutable=["batch_stats"])[0]
        self.variables["depth"] = self.depth.init(key, feats)
        if self.use_pose_net:
            dummy2 = jnp.zeros((1, o.height, o.width, 6), jnp.float32)
            if o.pose_model_type == "posecnn":
                self.variables["pose"] = self.pose.init(key, dummy2)
            else:
                self.variables["pose_encoder"] = self.pose_encoder.init(
                    key, dummy2, train=True)
                pf = self.pose_encoder.apply(
                    self.variables["pose_encoder"], dummy2, train=True,
                    mutable=["batch_stats"])[0]
                self.variables["pose"] = self.pose.init(key, [pf])

        schedule = step_lr(o.learning_rate, o.scheduler_step_size * 10 ** 9, 0.1)
        # the reference steps StepLR per epoch; we rescale below once the
        # dataset length is known
        self.schedule_epoch_steps = None
        self.tx = optax.chain(
            optax.scale_by_adam(),
            optax.scale_by_learning_rate(
                lambda s: self._lr_fn(s)),
        )
        params = {k: v["params"] for k, v in self.variables.items()}
        self.opt_state = self.tx.init(params)
        self.step = 0
        self.epoch = 0
        self.dataset = dataset
        self.val_dataset = val_dataset
        self._train_step = None
        if o.load_weights_folder:
            self.load_model()

    def _lr_fn(self, step):
        eps = self.schedule_epoch_steps or 10 ** 9
        n = jnp.asarray(step, jnp.int32) // (eps * self.opt.scheduler_step_size)
        return self.opt.learning_rate * 0.1 ** n.astype(jnp.float32)

    # ------------------------------------------------------------------
    def _loss_opt(self):
        return {
            "frame_ids": tuple(self.frame_ids),
            "scales": tuple(self.opt.scales),
            "height": self.opt.height,
            "width": self.opt.width,
            "min_depth": self.opt.min_depth,
            "max_depth": self.opt.max_depth,
            "disparity_smoothness": self.opt.disparity_smoothness,
            "v1_multiscale": self.opt.v1_multiscale,
            "avg_reprojection": self.opt.avg_reprojection,
            "disable_automasking": self.opt.disable_automasking,
            "no_ssim": self.opt.no_ssim,
            "pose_model_type": self.opt.pose_model_type,
        }

    def _build_train_step(self):
        nets = (self.encoder, self.depth, self.pose_encoder, self.pose)
        loss_opt = self._loss_opt()
        stats = {k: v.get("batch_stats", {}) for k, v in self.variables.items()}

        def loss_fn(params, inputs, rng):
            variables = {
                k: ({"params": params[k], "batch_stats": stats[k]}
                    if stats.get(k) else {"params": params[k]})
                for k in params
            }
            total, (losses, _) = monodepth_loss(
                variables, nets, inputs, loss_opt, rng, train=True)
            return total, losses

        def train_step(params, opt_state, inputs, rng):
            grads, losses = jax.grad(loss_fn, has_aux=True)(params, inputs, rng)
            updates, opt_state = self.tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, losses

        return jax.jit(train_step, donate_argnums=(0, 1))

    # ------------------------------------------------------------------
    def process_batch(self, inputs, rng=None):
        """Eval-mode forward + losses (``trainer.py:218-246``)."""
        nets = (self.encoder, self.depth, self.pose_encoder, self.pose)
        rng = rng if rng is not None else jax.random.PRNGKey(self.step)
        total, (losses, outputs) = monodepth_loss(
            self.variables, nets, inputs, self._loss_opt(), rng, train=False)
        return outputs, losses

    def _writer(self):
        if not hasattr(self, "_tb"):
            try:
                from tensorboardX import SummaryWriter

                self._tb = SummaryWriter(os.path.join(self.log_path, "train"))
            except ImportError:
                self._tb = None
        return self._tb

    def log_scalars(self, mode: str, losses) -> None:
        """TB scalar logging (``trainer.py:495-527``)."""
        tb = self._writer()
        if tb is None:
            return
        for k, v in losses.items():
            tb.add_scalar(f"{mode}/{k}", float(v), self.step)

    def val(self):
        """Single-minibatch validation (``trainer.py:304-323``)."""
        if self.val_dataset is None or len(self.val_dataset) == 0:
            return None
        bs = min(self.opt.batch_size, len(self.val_dataset))
        items = [self.val_dataset[i] for i in range(bs)]
        inputs = {_enc_key(k): jnp.asarray(np.stack([it[k] for it in items]))
                  for k in items[0] if k != "depth_gt"}
        _, losses = self.process_batch(inputs)
        losses = jax.device_get(losses)
        self.log_scalars("val", {k: v for k, v in losses.items()
                                 if np.ndim(v) == 0})
        return losses

    def train(self):
        """Full epoch-loop training (``trainer.py:180-216``)."""
        assert self.dataset is not None, "construct Trainer with a dataset"
        self.start_time = time.time()
        for self.epoch in range(self.opt.num_epochs):
            self.run_epoch()
            self.val()
            if (self.epoch + 1) % self.opt.save_frequency == 0:
                self.save_model()

    def run_epoch(self):
        if self._train_step is None:
            self._train_step = self._build_train_step()
        params = {k: v["params"] for k, v in self.variables.items()}
        n = len(self.dataset)
        bs = self.opt.batch_size
        self.schedule_epoch_steps = max(1, n // bs)
        order = np.random.permutation(n)
        for start in range(0, n - bs + 1, bs):
            batch_items = [self.dataset[int(i)] for i in order[start:start + bs]]
            inputs = {
                _enc_key(k): jnp.asarray(np.stack([it[k] for it in batch_items]))
                for k in batch_items[0]
            }
            rng = jax.random.PRNGKey(self.step)
            params, self.opt_state, losses = self._train_step(
                params, self.opt_state, inputs, rng)
            self.step += 1
            if self.step % self.opt.log_frequency == 0:
                host_losses = jax.device_get(losses)
                loss = float(host_losses["loss"])
                print(f"epoch {self.epoch} | step {self.step} | loss {loss:.4f}")
                self.log_scalars("train", host_losses)
        for k in self.variables:
            self.variables[k]["params"] = params[k]

    # ------------------------------------------------------------------
    def save_model(self):
        """Per-epoch weights folder; encoder file embeds the feed size
        (``trainer.py:540-558``)."""
        folder = os.path.join(self.log_path, "models",
                              f"weights_{self.epoch}")
        os.makedirs(folder, exist_ok=True)
        for name, v in self.variables.items():
            save_pytree(v, os.path.join(folder, f"{name}.ckpt"))
        with open(os.path.join(folder, "meta.json"), "w") as f:
            json.dump({"height": self.opt.height, "width": self.opt.width,
                       "use_stereo": self.use_stereo, "step": self.step}, f)
        save_pytree(self.opt_state, os.path.join(folder, "adam.ckpt"))

    def load_model(self):
        folder = self.opt.load_weights_folder
        for name in self.variables:
            p = os.path.join(folder, f"{name}.ckpt")
            if os.path.exists(p):
                self.variables[name] = load_pytree(p, self.variables[name])
        adam_p = os.path.join(folder, "adam.ckpt")
        if os.path.exists(adam_p):
            self.opt_state = load_pytree(adam_p, self.opt_state)
