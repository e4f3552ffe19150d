"""Conv/slicing building blocks vs. torch oracles."""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from rvc_tpu.models.commons import (
    Conv1d,
    ConvTranspose1d,
    rand_slice_segments,
    sequence_mask,
    slice_segments,
)


def _run_conv1d(x, kernel, bias, **kw):
    mod = Conv1d(features=kernel.shape[2], kernel_size=kernel.shape[0], **kw)
    params = {"params": {"kernel": jnp.asarray(kernel)}}
    if bias is not None:
        params["params"]["bias"] = jnp.asarray(bias)
    return np.asarray(mod.apply(params, jnp.asarray(x)))


def test_conv1d_matches_torch():
    rng = np.random.default_rng(0)
    b, t, cin, cout, k, d = 2, 50, 6, 8, 5, 3
    x = rng.standard_normal((b, t, cin)).astype(np.float32)
    w = rng.standard_normal((k, cin, cout)).astype(np.float32)
    bias = rng.standard_normal((cout,)).astype(np.float32)

    ours = _run_conv1d(x, w, bias, dilation=d)

    conv = torch.nn.Conv1d(cin, cout, k, dilation=d, padding=(k * d - d) // 2)
    with torch.no_grad():
        conv.weight.copy_(torch.from_numpy(w.transpose(2, 1, 0)))
        conv.bias.copy_(torch.from_numpy(bias))
        ref = conv(torch.from_numpy(x.transpose(0, 2, 1))).numpy()
    np.testing.assert_allclose(ours, ref.transpose(0, 2, 1), rtol=1e-4, atol=1e-5)


def test_conv1d_grouped_matches_torch():
    rng = np.random.default_rng(1)
    b, t, cin, cout, k, g = 2, 40, 16, 64, 41, 4
    x = rng.standard_normal((b, t, cin)).astype(np.float32)
    w = rng.standard_normal((k, cin // g, cout)).astype(np.float32) * 0.1

    ours = _run_conv1d(x, w, None, groups=g, stride=4, padding=20, use_bias=False)

    conv = torch.nn.Conv1d(cin, cout, k, stride=4, padding=20, groups=g, bias=False)
    with torch.no_grad():
        conv.weight.copy_(torch.from_numpy(w.transpose(2, 1, 0)))
        ref = conv(torch.from_numpy(x.transpose(0, 2, 1))).numpy()
    np.testing.assert_allclose(ours, ref.transpose(0, 2, 1), rtol=1e-4, atol=1e-5)


def test_conv_transpose1d_matches_torch_even_and_odd_rates():
    rng = np.random.default_rng(2)
    # (stride, kernel, torch padding, output_padding) — includes NSF odd-rate rule
    cases = [
        (10, 20, (20 - 10) // 2, 0),     # even rate
        (12, 24, (24 - 12) // 2, 0),     # even rate (48k first stage)
        (5, 10, 5 // 2 + 1, 1),          # odd rate: pad u//2 + u%2, out_pad u%2
        (3, 7, 3 // 2 + 1, 1),
    ]
    for u, k, p, op in cases:
        b, t, cin, cout = 2, 16, 8, 4
        x = rng.standard_normal((b, t, cin)).astype(np.float32)
        w = rng.standard_normal((k, cin, cout)).astype(np.float32) * 0.1

        mod = ConvTranspose1d(
            features=cout, kernel_size=k, stride=u, padding=p,
            output_padding=op, use_bias=False,
        )
        ours = np.asarray(
            mod.apply({"params": {"kernel": jnp.asarray(w)}}, jnp.asarray(x))
        )

        conv = torch.nn.ConvTranspose1d(
            cin, cout, k, stride=u, padding=p, output_padding=op, bias=False
        )
        with torch.no_grad():
            conv.weight.copy_(torch.from_numpy(w.transpose(1, 2, 0)))
            ref = conv(torch.from_numpy(x.transpose(0, 2, 1))).numpy()
        assert ours.shape == ref.transpose(0, 2, 1).shape, f"stride={u}"
        np.testing.assert_allclose(
            ours, ref.transpose(0, 2, 1), rtol=1e-4, atol=1e-5, err_msg=f"stride={u}"
        )


def test_weight_norm_conv_init_is_identity():
    """At init, weight-normalized conv == plain conv (g captures the norm)."""
    rng = np.random.default_rng(3)
    x = rng.standard_normal((1, 20, 4)).astype(np.float32)
    mod_wn = Conv1d(features=6, kernel_size=3, use_weight_norm=True)
    variables = mod_wn.init(jax.random.PRNGKey(0), jnp.asarray(x))
    out_wn = mod_wn.apply(variables, jnp.asarray(x))

    mod_plain = Conv1d(features=6, kernel_size=3)
    plain_params = {
        "params": {
            "kernel": variables["params"]["kernel"],
            "bias": variables["params"]["bias"],
        }
    }
    out_plain = mod_plain.apply(plain_params, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out_wn), np.asarray(out_plain), rtol=1e-5, atol=1e-6)


def test_sequence_mask():
    m = np.asarray(sequence_mask(jnp.array([2, 5]), 5))
    assert m.shape == (2, 5)
    np.testing.assert_array_equal(m[0], [1, 1, 0, 0, 0])
    np.testing.assert_array_equal(m[1], [1, 1, 1, 1, 1])


def test_slice_segments():
    x = jnp.arange(2 * 10 * 3, dtype=jnp.float32).reshape(2, 10, 3)
    out = np.asarray(slice_segments(x, jnp.array([2, 5]), 4))
    np.testing.assert_allclose(out[0], np.asarray(x)[0, 2:6])
    np.testing.assert_allclose(out[1], np.asarray(x)[1, 5:9])
    # 2D case (pitch)
    p = jnp.arange(20, dtype=jnp.float32).reshape(2, 10)
    out2 = np.asarray(slice_segments(p, jnp.array([1, 3]), 4))
    np.testing.assert_allclose(out2[0], np.asarray(p)[0, 1:5])


def test_rand_slice_in_bounds():
    x = jnp.zeros((4, 50, 2))
    lengths = jnp.array([50, 30, 20, 10])
    _, ids = rand_slice_segments(jax.random.PRNGKey(0), x, lengths, 10)
    ids = np.asarray(ids)
    assert np.all(ids >= 0)
    assert np.all(ids + 10 <= np.asarray(lengths))


def test_conv_transpose_polyphase_matches_dilated():
    """ConvTranspose1d's polyphase matmul path == the input-dilated conv
    formulation for every (k, s, padding, output_padding) the vocoders use."""
    import jax

    from rvc_tpu.models.commons import ConvTranspose1d

    rng = np.random.default_rng(0)
    for (t, cin, cout, k, s, pad, op) in [
        (50, 16, 8, 24, 12, 6, 0), (64, 8, 4, 20, 10, 5, 0),
        (40, 8, 8, 4, 2, 1, 0), (33, 6, 5, 15, 5, 5, 1),
    ]:
        x = jnp.asarray(rng.normal(size=(2, t, cin)), jnp.float32)
        m = ConvTranspose1d(cout, k, s, padding=pad, output_padding=op,
                            use_weight_norm=True)
        vs = m.init(jax.random.PRNGKey(0), x)
        out = m.apply(vs, x)
        kern = vs["params"]["kernel"]
        g = vs["params"]["g"]
        norm = jnp.sqrt(jnp.sum(jnp.square(kern), axis=(0, 2),
                                keepdims=True) + 1e-12)
        ke = kern / norm * g[None, :, None]
        ref = jax.lax.conv_general_dilated(
            x, jnp.flip(ke, 0), (1,), ((k - 1 - pad, k - 1 - pad + op),),
            lhs_dilation=(s,), dimension_numbers=("NHC", "HIO", "NHC"),
        ) + vs["params"]["bias"]
        assert ref.shape == out.shape
        rel = float(jnp.abs(ref - out).max() / (jnp.abs(ref).max() + 1e-9))
        assert rel < 1e-5, (k, s, rel)


def test_folded_conv_exactness():
    import jax

    from rvc_tpu.ops.folded_conv import folded_conv1d

    rng = np.random.default_rng(0)
    for (t, c, k, d, fold) in [(4096, 32, 11, 5, 4), (4096, 32, 3, 1, 8),
                               (8192, 64, 7, 3, 2)]:
        x = jnp.asarray(rng.normal(size=(1, t, c)), jnp.float32)
        w = jnp.asarray(rng.normal(size=(k, c, c)) * 0.1, jnp.float32)
        pad = (k * d - d) // 2
        ref = jax.lax.conv_general_dilated(
            x, w, (1,), ((pad, pad),), rhs_dilation=(d,),
            dimension_numbers=("NHC", "HIO", "NHC"))
        out = folded_conv1d(x, w, d, fold)
        rel = float(jnp.abs(ref - out).max() / jnp.abs(ref).max())
        assert rel < 1e-5, rel


def test_banded_attention_matches_loops():
    """The banded-correction rel-pos attention == explicit per-pair loops."""
    import jax

    from rvc_tpu.models.attentions import MultiHeadAttention

    rng = np.random.default_rng(0)
    L, w = 40, 10
    mha = MultiHeadAttention(32, 32, 2, window_size=w)  # dense skew (L<448)
    x = jnp.asarray(rng.normal(size=(1, L, 32)), jnp.float32)
    vs = mha.init(jax.random.PRNGKey(0), x, x)
    out = np.asarray(mha.apply(vs, x, x))
    # the banded path (default engages only at L>448) must agree: force it
    banded = MultiHeadAttention(32, 32, 2, window_size=w, banded_min_t=0)
    out_banded = np.asarray(banded.apply(vs, x, x))
    assert np.abs(out - out_banded).max() / np.abs(out).max() < 1e-5
    p = vs["params"]

    def c1(px, name):
        return px @ np.asarray(p[name]["kernel"])[0] + np.asarray(p[name]["bias"])

    q = c1(np.asarray(x), "conv_q").reshape(1, L, 2, 16).transpose(0, 2, 1, 3)
    k = c1(np.asarray(x), "conv_k").reshape(1, L, 2, 16).transpose(0, 2, 1, 3)
    v = c1(np.asarray(x), "conv_v").reshape(1, L, 2, 16).transpose(0, 2, 1, 3)
    sc = 16 ** -0.5
    scores = np.einsum("bhtd,bhsd->bhts", q * sc, k)
    ek = np.asarray(p["emb_rel_k"])[0]
    ev = np.asarray(p["emb_rel_v"])[0]
    for t in range(L):
        for s in range(L):
            if -w <= s - t <= w:
                scores[:, :, t, s] += (q[:, :, t] * sc) @ ek[s - t + w]
    pa = np.exp(scores - scores.max(-1, keepdims=True))
    pa /= pa.sum(-1, keepdims=True)
    ref = np.einsum("bhts,bhsd->bhtd", pa, v)
    for t in range(L):
        for s in range(L):
            if -w <= s - t <= w:
                ref[:, :, t] += pa[:, :, t, s, None] * ev[s - t + w]
    ref = c1(ref.transpose(0, 2, 1, 3).reshape(1, L, 32), "conv_o")
    rel = np.abs(out - ref).max() / np.abs(ref).max()
    assert rel < 1e-5, rel


def test_banded_attention_suppressive_bias_stable():
    """When the learned rel-pos bias strongly suppresses the in-band mass
    (biased partition << plain partition), the banded path must still match
    the dense skew. A correction-term formulation (out = [p@v + c@v]/(1+sum c))
    loses most significant bits here; the out-of-band/in-band split must not."""
    import jax

    from rvc_tpu.models.attentions import MultiHeadAttention

    rng = np.random.default_rng(7)
    L, w = 64, 10
    mha = MultiHeadAttention(32, 32, 2, window_size=w)
    # near-diagonal content attention: keys ~ queries, so plain softmax mass
    # concentrates inside the band that the bias then suppresses
    x = jnp.asarray(rng.normal(size=(1, L, 32)) * 3.0, jnp.float32)
    vs = mha.init(jax.random.PRNGKey(0), x, x)
    p = jax.tree_util.tree_map(lambda a: a, vs["params"])
    # force a strongly negative in-band bias: bias_band = (q*scale) @ ek, so
    # point every rel embedding opposite the mean query direction, scaled up
    q = (np.asarray(x) @ np.asarray(p["conv_q"]["kernel"])[0]
         + np.asarray(p["conv_q"]["bias"])).reshape(1, L, 2, 16)
    qbar = q.mean(axis=(0, 1))                      # [2, 16] per-head mean
    ek = np.broadcast_to(-8.0 * qbar.mean(0), (1, 2 * w + 1, 16))
    p["emb_rel_k"] = jnp.asarray(ek, jnp.float32)
    vs = {"params": p}

    dense = np.asarray(mha.apply(vs, x, x))         # L=64 < 448 -> dense skew
    banded = MultiHeadAttention(32, 32, 2, window_size=w, banded_min_t=0)
    out_banded = np.asarray(banded.apply(vs, x, x))
    rel = np.abs(dense - out_banded).max() / np.abs(dense).max()
    assert rel < 1e-4, rel


def test_attention_heads_share_false_per_head():
    """With heads_share=False each head must use ITS OWN rel embedding —
    the einsum must contract d only, never sum over the head axis."""
    import jax

    from rvc_tpu.models.attentions import MultiHeadAttention

    rng = np.random.default_rng(1)
    L, w = 24, 6
    mha = MultiHeadAttention(32, 32, 2, window_size=w, heads_share=False)
    x = jnp.asarray(rng.normal(size=(1, L, 32)), jnp.float32)
    vs = mha.init(jax.random.PRNGKey(0), x, x)
    assert vs["params"]["emb_rel_k"].shape[0] == 2
    out = np.asarray(mha.apply(vs, x, x))
    banded = MultiHeadAttention(
        32, 32, 2, window_size=w, heads_share=False, banded_min_t=0)
    out_banded = np.asarray(banded.apply(vs, x, x))
    assert np.abs(out - out_banded).max() / np.abs(out).max() < 1e-5
    p = vs["params"]

    def c1(px, name):
        return px @ np.asarray(p[name]["kernel"])[0] + np.asarray(p[name]["bias"])

    q = c1(np.asarray(x), "conv_q").reshape(1, L, 2, 16).transpose(0, 2, 1, 3)
    k = c1(np.asarray(x), "conv_k").reshape(1, L, 2, 16).transpose(0, 2, 1, 3)
    v = c1(np.asarray(x), "conv_v").reshape(1, L, 2, 16).transpose(0, 2, 1, 3)
    sc = 16 ** -0.5
    scores = np.einsum("bhtd,bhsd->bhts", q * sc, k)
    ek = np.asarray(p["emb_rel_k"])  # [H, 2w+1, d]
    ev = np.asarray(p["emb_rel_v"])
    for h in range(2):
        for t in range(L):
            for s in range(L):
                if -w <= s - t <= w:
                    scores[:, h, t, s] += (q[:, h, t] * sc) @ ek[h, s - t + w]
    pa = np.exp(scores - scores.max(-1, keepdims=True))
    pa /= pa.sum(-1, keepdims=True)
    ref = np.einsum("bhts,bhsd->bhtd", pa, v)
    for h in range(2):
        for t in range(L):
            for s in range(L):
                if -w <= s - t <= w:
                    ref[:, h, t] += pa[:, h, t, s, None] * ev[h, s - t + w]
    ref = c1(ref.transpose(0, 2, 1, 3).reshape(1, L, 32), "conv_o")
    rel = np.abs(out - ref).max() / np.abs(ref).max()
    assert rel < 1e-5, rel
