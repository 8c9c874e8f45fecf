"""Pallas kernel correctness (interpret mode on the CPU mesh)."""

import numpy as np
import pytest

from endosr.kernels.fused_in_mod import (
    fused_instance_norm_modulate,
    instance_norm_modulate_reference,
)

RNG = np.random.default_rng(9)


@pytest.mark.parametrize("shape", [(2, 16, 16, 8), (1, 32, 8, 16)])
def test_fused_in_mod_matches_reference(shape):
    x = RNG.standard_normal(shape).astype(np.float32)
    gamma = RNG.standard_normal(shape).astype(np.float32) * 0.1
    beta = RNG.standard_normal(shape).astype(np.float32) * 0.1
    want = np.asarray(instance_norm_modulate_reference(x, gamma, beta))
    got = np.asarray(
        fused_instance_norm_modulate(x, gamma, beta, interpret=True)
    )
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_fused_in_mod_matches_torch_instancenorm():
    import torch
    import torch.nn.functional as F

    x = RNG.standard_normal((2, 12, 12, 6)).astype(np.float32)
    zeros = np.zeros_like(x)
    got = np.asarray(fused_instance_norm_modulate(x, zeros, zeros,
                                                  interpret=True))
    want = F.instance_norm(
        torch.from_numpy(x).permute(0, 3, 1, 2)
    ).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_output_stage_twin_and_wiring():
    """Fused clip→shuffle→fp32 output stage (endosr/kernels/output_stage.py):
    the jnp twin equals clip+pixel_shuffle+convert, and DepthNet's
    pallas_output path returns the same NHWC tensor as the plain path
    (on CPU the kernel falls back to the twin; TPU bit-exactness is
    checked in tools/bench_breakdown.kernels_ab)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from endosr.kernels.output_stage import output_stage, output_stage_reference
    from endosr.nn.layers import pixel_shuffle

    rng = np.random.default_rng(7)
    pre = jnp.asarray(rng.random((2, 16, 16, 48), dtype=np.float32) * 1.4 - 0.2)
    want = jnp.clip(pixel_shuffle(pre, 4), 0.0, 1.0)
    got = output_stage(pre, 4).reshape(2, 64, 64, 3)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    # gradient flows through the custom_vjp
    g = jax.grad(lambda p: jnp.sum(output_stage(p, 4) ** 2))(pre)
    assert np.isfinite(np.asarray(g)).all()

    from endosr.nn.depthnet import DepthNet
    from endosr.ops.masks import depth_masks_np

    lq = rng.random((1, 16, 16, 3), dtype=np.float32)
    depth = rng.random((1, 16, 16), dtype=np.float32)
    masks = depth_masks_np(depth[0], True, 10)[None].astype(np.float32)
    depth = depth[..., None].astype(np.float32)
    kw = dict(which_resblk_depth=(0, 1), scale=4, depth_latent_ch=16)
    net_p = DepthNet(pallas_output=True, **kw)
    net_x = DepthNet(pallas_output=False, **kw)
    params = net_p.init(jax.random.PRNGKey(3), lq, depth, masks)["params"]
    op = np.asarray(net_p.apply({"params": params}, lq, depth, masks))
    ox = np.asarray(net_x.apply({"params": params}, lq, depth, masks))
    assert op.shape == ox.shape == (1, 64, 64, 3)
    np.testing.assert_allclose(op, ox, atol=1e-6)


def test_mid_shuffle_twin_and_grad():
    """mid_shuffle (endosr/kernels/shuffle_mid.py): exact pixel_shuffle
    twin + exact linear adjoint. On CPU it falls back to the twin; the TPU
    kernel path was verified bit-exact on v5e (see module docstring — kept
    unwired because custom-call operand layouts make it lose in-net)."""
    import jax
    import jax.numpy as jnp

    from endosr.kernels.shuffle_mid import mid_shuffle
    from endosr.nn.layers import pixel_shuffle

    rng = np.random.default_rng(3)
    z = jnp.asarray(rng.random((2, 8, 8, 512), dtype=np.float32) - 0.5)
    want = pixel_shuffle(z, 2)
    got = mid_shuffle(z, 2)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    g1 = jax.grad(lambda z: jnp.sum(pixel_shuffle(z, 2) ** 2))(z)
    g2 = jax.grad(lambda z: jnp.sum(mid_shuffle(z, 2) ** 2))(z)
    np.testing.assert_array_equal(np.asarray(g1), np.asarray(g2))


def test_output_stage_x8_embed_and_kernel():
    """v3 output stage (endosr/kernels/output_stage.py): the embedded-
    channel producer + M-stacked interleave kernel reproduces the v2
    reference bit-exactly (interpret mode), and gradients flow through
    the twin's VJP."""
    import jax
    import jax.numpy as jnp

    from endosr.kernels.output_stage import (
        _forward_x8,
        embed_head_channels,
        output_stage_reference,
        output_stage_x8,
        output_stage_x8_reference,
    )

    x = jnp.asarray(RNG.standard_normal((2, 16, 128, 8)), jnp.float32)
    wh = jnp.asarray(RNG.standard_normal((3, 3, 8, 48)), jnp.float32) * 0.2
    bh = jnp.asarray(RNG.standard_normal((48,)), jnp.float32) * 0.1
    conv = lambda w, b: jax.lax.conv_general_dilated(  # noqa: E731
        x, w, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + b
    want = np.asarray(output_stage_reference(conv(wh, bh), 4))
    w64, b64 = embed_head_channels(wh, bh)
    pre64 = conv(w64, b64)
    np.testing.assert_array_equal(
        np.asarray(output_stage_x8_reference(pre64)), want)
    np.testing.assert_array_equal(
        np.asarray(_forward_x8(pre64, 0.0, 1.0, interpret=True)), want)
    g = jax.grad(lambda p: jnp.sum(output_stage_x8(p) ** 2))(pre64)
    gref = jax.grad(
        lambda p: jnp.sum(output_stage_x8_reference(p) ** 2))(pre64)
    np.testing.assert_array_equal(np.asarray(g), np.asarray(gref))
    # order="hbwc": the [H,B,W,64] layout head_dot emits
    pre_h = jnp.transpose(pre64, (1, 0, 2, 3))
    np.testing.assert_array_equal(
        np.asarray(output_stage_x8_reference(pre_h, order="hbwc")), want)
    np.testing.assert_array_equal(
        np.asarray(_forward_x8(pre_h, 0.0, 1.0, order="hbwc",
                               interpret=True)), want)
    gh = jax.grad(
        lambda p: jnp.sum(output_stage_x8(p, 0.0, 1.0, "hbwc") ** 2))(pre_h)
    np.testing.assert_array_equal(
        np.asarray(gh), np.asarray(jnp.transpose(gref, (1, 0, 2, 3))))


def test_style_dot_hwbm_kernel():
    """Conv-layout-emitting style dot (endosr/kernels/style_dot.py):
    interpret-mode parity with the einsum twin + VJP parity."""
    import jax
    import jax.numpy as jnp

    from endosr.kernels.style_dot import (
        _forward,
        style_dot_hwbm,
        style_dot_reference,
    )

    s = jnp.asarray(RNG.standard_normal((8, 16, 128, 90)), jnp.float32)
    v = jnp.asarray(RNG.standard_normal((8, 90, 256)), jnp.float32)
    want = np.asarray(style_dot_reference(s, v))
    np.testing.assert_allclose(
        np.asarray(_forward(s, v, interpret=True)), want, atol=1e-4)
    g0 = jax.grad(lambda a, b: jnp.sum(style_dot_hwbm(a, b) ** 2),
                  argnums=(0, 1))(s, v)
    g1 = jax.grad(lambda a, b: jnp.sum(style_dot_reference(a, b) ** 2),
                  argnums=(0, 1))(s, v)
    for a, b in zip(g0, g1):
        # dot-vs-einsum accumulation order: rel ~5e-7 on O(1e4) values
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=5e-2)


def test_head_dot_kernel():
    """Tap-stacked head conv (endosr/kernels/head_dot.py): interpret-mode
    parity with the conv twin on an HWNC [Hp,Wc,B,C4] input whose dead
    row/column n and pad columns hold GARBAGE (the s=0 packed gate is
    applied in-kernel), HBWC output + VJP through the twin."""
    import jax
    import jax.numpy as jnp

    from endosr.kernels.head_dot import (
        _forward,
        head_dot,
        head_dot_reference,
    )

    Hp, Wc, B, C4, COUT = 33, 40, 2, 256, 64
    g4 = RNG.standard_normal((B, Hp, Wc, C4)).astype(np.float32) * 0.1
    g4[:, Hp - 1:, :, :] = 7.5   # dead slots: must be gated in-kernel
    g4[:, :, Hp - 1:, :] = -3.25
    g4 = jnp.asarray(g4).transpose(1, 2, 0, 3)
    w64 = jnp.asarray(
        RNG.standard_normal((3, 3, C4, COUT)).astype(np.float32) * 0.05)
    b64 = jnp.asarray(
        RNG.standard_normal((COUT,)).astype(np.float32) * 0.1)
    want = np.asarray(head_dot_reference(g4, w64, b64))
    got = np.asarray(_forward(g4, w64, b64, interpret=True))
    # tap-split accumulation reassociates the conv's f32 reduction
    np.testing.assert_allclose(got, want, atol=2e-6)
    g0 = jax.grad(lambda a, w, b: jnp.sum(head_dot(a, w, b) ** 2),
                  argnums=(0, 1, 2))(g4, w64, b64)
    g1 = jax.grad(
        lambda a, w, b: jnp.sum(head_dot_reference(a, w, b) ** 2),
        argnums=(0, 1, 2))(g4, w64, b64)
    for a, b in zip(g0, g1):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5,
                                   atol=1e-4)

    # pre_bias (producer epilogue fused in — the flagship serving path):
    # g4 is the RAW conv output; bias + leaky_relu run in-kernel before
    # the gates
    pb = jnp.asarray(RNG.standard_normal((C4,)).astype(np.float32) * 0.1)
    want_pb = np.asarray(head_dot_reference(g4, w64, b64, None, pb))
    got_pb = np.asarray(_forward(g4, w64, b64, pb, interpret=True))
    np.testing.assert_allclose(got_pb, want_pb, atol=2e-6)

    # rectangular grid (wout ≠ Hp−1): non-square ×8 frames route here; the
    # dead column sits at wout, with garbage beyond it
    WOUT = 24
    g4r = RNG.standard_normal((B, Hp, Wc, C4)).astype(np.float32) * 0.1
    g4r[:, Hp - 1:, :, :] = 5.5
    g4r[:, :, WOUT:, :] = -2.75
    g4r = jnp.asarray(g4r).transpose(1, 2, 0, 3)
    want_r = np.asarray(head_dot_reference(g4r, w64, b64, WOUT))
    got_r = np.asarray(_forward(g4r, w64, b64, None, WOUT, interpret=True))
    assert got_r.shape == (Hp - 1, B, WOUT, COUT)
    np.testing.assert_allclose(got_r, want_r, atol=2e-6)
    gr0 = jax.grad(lambda a, w, b: jnp.sum(head_dot(a, w, b, WOUT) ** 2),
                   argnums=(0, 1, 2))(g4r, w64, b64)
    gr1 = jax.grad(
        lambda a, w, b: jnp.sum(head_dot_reference(a, w, b, WOUT) ** 2),
        argnums=(0, 1, 2))(g4r, w64, b64)
    for a, b in zip(gr0, gr1):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5,
                                   atol=1e-4)

    # fused producer epilogue: raw conv input + in-kernel bias/leaky_relu
    # must equal epilogue-then-head on the same raw tensor
    pb = jnp.asarray(RNG.standard_normal((C4,)).astype(np.float32) * 0.2)
    want_e = np.asarray(head_dot_reference(g4r, w64, b64, WOUT, pb, 0.2))
    got_e = np.asarray(_forward(g4r, w64, b64, pb, WOUT, 0.2,
                                interpret=True))
    np.testing.assert_allclose(got_e, want_e, atol=2e-6)
    y = g4r + pb.reshape(1, 1, 1, -1)
    manual = np.asarray(head_dot_reference(
        jnp.maximum(y, 0.2 * y), w64, b64, WOUT))
    np.testing.assert_allclose(want_e, manual, atol=2e-6)
    ge0 = jax.grad(
        lambda a, w, b, p: jnp.sum(head_dot(a, w, b, WOUT, p) ** 2),
        argnums=(0, 1, 2, 3))(g4r, w64, b64, pb)
    ge1 = jax.grad(
        lambda a, w, b, p: jnp.sum(
            head_dot_reference(a, w, b, WOUT, p, 0.2) ** 2),
        argnums=(0, 1, 2, 3))(g4r, w64, b64, pb)
    for a, b in zip(ge0, ge1):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5,
                                   atol=1e-4)


def test_style_blend_dot_kernel():
    """Fused style+blend kernel (endosr/kernels/style_dot.py): interpret-mode
    parity with the jnp twin, plus VJP to every operand (shifted, v, each
    raw conv, bias)."""
    import jax
    import jax.numpy as jnp

    from endosr.kernels.style_dot import (
        _blend_forward,
        style_blend_reference,
        style_blend_supported,
    )

    B, H, W, J, C2, G2 = 2, 16, 16, 90, 128, 4
    M = G2 * C2
    assert style_blend_supported((B, H, W, J), M, G2)
    sh = jnp.asarray(RNG.standard_normal((B, H, W, J)).astype(np.float32))
    v = jnp.asarray(
        RNG.standard_normal((B, J, M)).astype(np.float32) * 0.1)
    convs = tuple(
        jnp.asarray(RNG.standard_normal((H, W, B, C2)).astype(np.float32))
        for _ in range(G2))
    bias = jnp.asarray(RNG.standard_normal((M,)).astype(np.float32))
    want = np.asarray(style_blend_reference(sh, v, convs, bias))
    got = np.asarray(_blend_forward(sh, v, convs, bias, interpret=True))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-5)

    from endosr.kernels.style_dot import style_blend_dot

    def loss_k(s, vv, cs, b):
        return jnp.sum(style_blend_dot(s, vv, cs, b) ** 2)

    def loss_r(s, vv, cs, b):
        return jnp.sum(style_blend_reference(s, vv, cs, b) ** 2)

    g0 = jax.grad(loss_k, argnums=(0, 1, 2, 3))(sh, v, convs, bias)
    g1 = jax.grad(loss_r, argnums=(0, 1, 2, 3))(sh, v, convs, bias)
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-3)

    # hwbc: shifted handed in the mask-conv producer's [H,W,B,J] order
    sh_h = jnp.transpose(sh, (1, 2, 0, 3))
    got_h = np.asarray(_blend_forward(sh_h, v, convs, bias, hwbc=True,
                                      interpret=True))
    np.testing.assert_allclose(got_h, want, atol=2e-5, rtol=1e-5)
    gh = jax.grad(lambda s, vv, cs, b: jnp.sum(
        style_blend_dot(s, vv, cs, b, True) ** 2),
        argnums=(0, 1, 2, 3))(sh_h, v, convs, bias)
    gr = jax.grad(loss_r, argnums=(0, 1, 2, 3))(sh, v, convs, bias)
    np.testing.assert_allclose(
        np.asarray(gh[0]), np.asarray(jnp.transpose(gr[0], (1, 2, 0, 3))),
        rtol=1e-4, atol=1e-3)
    for a, b in zip(jax.tree.leaves(gh[1:]), jax.tree.leaves(gr[1:])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-3)


def test_packed_chain_kernel():
    """Fused packed-stage chain (endosr/kernels/packed_chain.py):
    interpret-mode parity with the jnp twin — plain g1→g3, ragged row
    grid, pre_act + absorbed stage-4 — plus VJP to every operand.
    Tolerances reflect tap-dot vs conv accumulation order through up to
    four chained stages (fp32; verified noise, not structure — the
    in-kernel stage-4 is exact vs the kernel's own g3)."""
    import jax
    import jax.numpy as jnp

    from endosr.kernels.packed_chain import (
        _forward,
        packed_g123,
        packed_g123_reference,
        packed_g123_supported,
    )

    rng = np.random.default_rng(0)
    Nx, Mx, B, Cin4, C4, C4O = 24, 20, 2, 128, 128, 256
    x = jnp.asarray(rng.standard_normal((Nx, Mx, B, Cin4)).astype(np.float32) * 0.1)
    k1 = jnp.asarray(rng.standard_normal((2, 2, Cin4, C4)).astype(np.float32) * 0.05)
    k2 = jnp.asarray(rng.standard_normal((2, 2, C4, C4)).astype(np.float32) * 0.05)
    k3 = jnp.asarray(rng.standard_normal((2, 2, C4, C4)).astype(np.float32) * 0.05)
    k4 = jnp.asarray(rng.standard_normal((2, 2, C4, C4O)).astype(np.float32) * 0.05)
    b1, b2, b3 = (jnp.asarray(rng.standard_normal((C4,)).astype(np.float32) * 0.1)
                  for _ in range(3))
    b4 = jnp.asarray(rng.standard_normal((C4O,)).astype(np.float32) * 0.1)
    assert packed_g123_supported((256, 256, 8, 128), 128, 2)
    assert packed_g123_supported((128, 128, 8, 256), 128, 2, 512)

    want = np.asarray(packed_g123_reference(x, k1, b1, k2, b2, k3, b3))
    got = np.asarray(_forward(x, k1, b1, k2, b2, k3, b3, interpret=True))
    assert got.shape == (Nx + 1, Mx + 1, B, C4)
    np.testing.assert_allclose(got, want, atol=2e-4)

    want4 = np.asarray(packed_g123_reference(
        x, k1, b1, k2, b2, k3, b3, k4, b4, True))
    got4 = np.asarray(_forward(
        x, k1, b1, k2, b2, k3, b3, k4, b4, True, interpret=True))
    assert got4.shape == (Nx + 1, Mx + 1, B, C4O)
    np.testing.assert_allclose(got4, want4, atol=2e-3)

    g0 = jax.grad(lambda *a: jnp.sum(packed_g123(*a, pre_act=True) ** 2),
                  argnums=tuple(range(9)))(x, k1, b1, k2, b2, k3, b3, k4, b4)
    g1_ = jax.grad(
        lambda *a: jnp.sum(packed_g123_reference(*a, pre_act=True) ** 2),
        argnums=tuple(range(9)))(x, k1, b1, k2, b2, k3, b3, k4, b4)
    for a, b in zip(g0, g1_):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=5e-2)

    # phases mode: x handed as the phase-packed producer tensor
    # [Hg, Wg, B, 4·Cin] with GARBAGE in the dead row/col Hg−1/Wg−1 (the
    # interleave slice drops them); in-VMEM unfold == unfold_g4_phases
    from endosr.kernels.packed_chain import unfold_g4_phases

    Hg, Wg = Nx // 2 + 1, Mx // 2 + 1
    g4p = rng.standard_normal((Hg, Wg, B, 4 * Cin4)).astype(np.float32) * 0.1
    g4p[Hg - 1] = 9.0
    g4p[:, Wg - 1] = -9.0
    g4p = jnp.asarray(g4p)
    xz = unfold_g4_phases(g4p)
    assert xz.shape == (Nx, Mx, B, Cin4)
    want_ph = np.asarray(packed_g123_reference(xz, k1, b1, k2, b2, k3, b3))
    got_ph = np.asarray(_forward(g4p, k1, b1, k2, b2, k3, b3, phases=True,
                                 interpret=True))
    np.testing.assert_allclose(got_ph, want_ph, atol=2e-4)
    gph0 = jax.grad(lambda a: jnp.sum(packed_g123(
        a, k1, b1, k2, b2, k3, b3, None, None, False, None, True) ** 2))(g4p)
    gph1 = jax.grad(lambda a: jnp.sum(packed_g123_reference(
        unfold_g4_phases(a), k1, b1, k2, b2, k3, b3) ** 2))(g4p)
    np.testing.assert_allclose(np.asarray(gph0), np.asarray(gph1),
                               rtol=1e-3, atol=5e-2)

    # pre_bias (deferred producer bias — the tail_defer_act serving path):
    # x is the RAW producer conv output; bias + leaky_relu run in-kernel
    pb = jnp.asarray(rng.standard_normal((Cin4,)).astype(np.float32) * 0.1)
    want_pb = np.asarray(packed_g123_reference(
        x, k1, b1, k2, b2, k3, b3, pre_act=True, pre_bias=pb))
    got_pb = np.asarray(_forward(
        x, k1, b1, k2, b2, k3, b3, pre_act=True, pre_bias=pb,
        interpret=True))
    np.testing.assert_allclose(got_pb, want_pb, atol=2e-4)
    gp0 = jax.grad(
        lambda a, c: jnp.sum(packed_g123(
            a, k1, b1, k2, b2, k3, b3, pre_act=True, pre_bias=c) ** 2),
        argnums=(0, 1))(x, pb)
    gp1 = jax.grad(
        lambda a, c: jnp.sum(packed_g123_reference(
            a, k1, b1, k2, b2, k3, b3, pre_act=True, pre_bias=c) ** 2),
        argnums=(0, 1))(x, pb)
    for a, b in zip(gp0, gp1):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=5e-2)


def test_bf16_odd_batch_rejected_by_support_gates():
    """Mosaic cannot compile the kernels for odd-b bf16 operands (the
    (2,1) sublane packing rejects odd-b strip slices — the bs=1 dummy
    init in FModelDepthCond hit it on TPU, round 4). The support gates
    must refuse those shapes so the jnp twins serve them; fp32 (no
    sub-byte packing) and even b stay eligible."""
    from endosr.kernels.head_dot import head_dot_supported
    from endosr.kernels.packed_chain import packed_g123_supported
    from endosr.kernels.style_dot import (
        style_blend_supported,
        style_dot_supported,
    )

    assert not packed_g123_supported((128, 128, 1, 256), 128, itemsize=2)
    assert packed_g123_supported((128, 128, 2, 256), 128, itemsize=2)
    assert packed_g123_supported((128, 128, 1, 256), 128, itemsize=4)

    assert not head_dot_supported((257, 264, 1, 512), 64, wout=256,
                                  itemsize=2)
    assert head_dot_supported((257, 264, 2, 512), 64, wout=256, itemsize=2)

    assert not style_dot_supported((1, 128, 128, 90), 1280, itemsize=2)
    assert style_dot_supported((2, 128, 128, 90), 1280, itemsize=2)
    assert style_dot_supported((1, 128, 128, 90), 1280, itemsize=4)

    assert not style_blend_supported((1, 128, 128, 90), 1280, 10,
                                     itemsize=2)
    assert style_blend_supported((2, 128, 128, 90), 1280, 10, itemsize=2)
