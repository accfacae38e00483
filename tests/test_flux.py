"""FLUX.1-Kontext model + converter tests (tiny configs).

The transformer/VAE converters are validated for LAYOUT COMPLETENESS against
state dicts synthesized FROM the declared mapping tables (diffusers names,
flax shapes), and the Kontext edit loop runs end-to-end. The text towers
(CLIP/T5) have full numeric HF oracles in test_convert_oracle.py.
"""

import jax
import jax.numpy as jnp
import numpy as np

from followmyhold_tpu.models.flux import (
    FLUX_TINY_TEST,
    FLUX_VAE_TINY,
    FluxTransformer,
    FluxVae,
    kontext_edit,
    latent_ids,
    pack_latents,
    unpack_latents,
)


def _get(params, path):
    node = params
    for k in path.split("/"):
        node = node[k]
    return np.asarray(node)


def _synth_from_mapping(mapping, params, rng):
    sd = {}
    for src, dst, kind in mapping:
        v = _get(params, "params/" + dst)
        if kind == "dense":
            shape = (v.shape[1], v.shape[0])
        elif kind == "conv":
            shape = (v.shape[3], v.shape[2], v.shape[0], v.shape[1])
        else:
            shape = v.shape
        sd[src] = rng.normal(0, 0.05, shape).astype(np.float32)
    return sd


def test_pack_unpack_roundtrip():
    z = jnp.asarray(np.random.default_rng(0).normal(
        size=(2, 8, 6, 4)).astype(np.float32))
    t = pack_latents(z)
    assert t.shape == (2, 4 * 3, 16)
    np.testing.assert_allclose(np.asarray(unpack_latents(t, 8, 6)),
                               np.asarray(z))


def test_flux_transformer_converter_layout():
    from followmyhold_tpu.convert.common import to_mutable
    from followmyhold_tpu.convert.flux import (
        convert_flux_transformer,
        flux_transformer_mapping,
    )

    cfg = FLUX_TINY_TEST
    model = FluxTransformer(cfg)
    n = 8
    params = to_mutable(model.init(
        jax.random.key(0), jnp.zeros((1, n, cfg.in_channels)),
        jnp.zeros((1, 4, cfg.joint_dim)), jnp.zeros((1, cfg.pooled_dim)),
        jnp.ones((1,)), jnp.zeros((n, 3)), jnp.zeros((4, 3)), jnp.ones((1,))))
    rng = np.random.default_rng(1)
    sd = _synth_from_mapping(flux_transformer_mapping(cfg), params, rng)

    conv, report = convert_flux_transformer(sd, cfg, n_tokens=n)
    assert not report.missing_src, report.missing_src[:8]
    assert not report.unused_src, report.unused_src[:8]
    out = model.apply(conv, jnp.ones((1, n, cfg.in_channels)),
                      jnp.ones((1, 4, cfg.joint_dim)),
                      jnp.ones((1, cfg.pooled_dim)), jnp.full((1,), 0.5),
                      jnp.asarray(latent_ids(2, 4)), jnp.zeros((4, 3)),
                      jnp.full((1,), 2.5))
    assert out.shape == (1, n, cfg.in_channels)
    assert np.isfinite(np.asarray(out)).all()


def test_flux_vae_converter_layout_and_edit():
    from followmyhold_tpu.convert.common import to_mutable
    from followmyhold_tpu.convert.flux import convert_flux_vae, flux_vae_mapping

    cfg = FLUX_VAE_TINY
    vae = FluxVae(cfg)
    params = to_mutable(vae.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3))))
    rng = np.random.default_rng(2)
    sd = _synth_from_mapping(flux_vae_mapping(cfg), params, rng)
    conv, report = convert_flux_vae(sd, cfg, size=32)
    assert not report.missing_src, report.missing_src[:8]
    assert not report.unused_src, report.unused_src[:8]

    img = jnp.asarray(rng.uniform(0, 1, (1, 32, 32, 3)).astype(np.float32))
    tr = FluxTransformer(FLUX_TINY_TEST)
    h2 = 32 // 8 // 2
    nimg = h2 * h2
    ids = jnp.asarray(np.concatenate(
        [latent_ids(h2, h2, 0), latent_ids(h2, h2, 1)]))
    tp = tr.init(jax.random.key(1), jnp.zeros((1, 2 * nimg, 16)),
                 jnp.zeros((1, 6, 32)), jnp.zeros((1, 24)), jnp.ones((1,)),
                 ids, jnp.zeros((6, 3)), jnp.ones((1,)))
    out = kontext_edit(tr, tp, vae, conv, jnp.zeros((1, 6, 32)),
                       jnp.zeros((1, 24)), img, jax.random.key(3), num_steps=2)
    assert out.shape == (1, 32, 32, 3)
    assert np.isfinite(np.asarray(out)).all()
