"""AOT export round-trip: serialize -> deserialize -> execute == direct jit."""

import numpy as np


def test_export_roundtrip(tmp_path):
    import jax
    from jax import export as jexport

    from disentangledcolorization_tpu.models import AnchorColorProb

    model = AnchorColorProb(sp_size=16, n_clusters=2, enhanced=True)
    grays = jnp_rand((2, 64, 64, 1))
    colors = np.zeros((2, 64, 64, 2), np.float32)
    variables = model.init(
        {"params": jax.random.key(0), "anchor": jax.random.key(1)},
        grays[:1],
        colors[:1],
        True,
        0,
        False,
    )

    def forward(variables, grays, colors, key_data):
        key = jax.random.wrap_key_data(key_data)
        out = model.apply(variables, grays, colors, True, 0, False, rngs={"anchor": key})
        return out["pred_colors"]

    key_data = jax.random.key_data(jax.random.key(7))
    args = (variables, grays, colors, key_data)
    exp = jexport.export(jax.jit(forward))(*args)
    blob = exp.serialize()
    assert len(blob) > 1000

    path = tmp_path / "disco.shlo"
    path.write_bytes(blob)
    re_exp = jexport.deserialize(path.read_bytes())
    got = np.asarray(re_exp.call(*args))
    want = np.asarray(jax.jit(forward)(*args))
    assert got.shape == (2, 64, 64, 2)
    np.testing.assert_allclose(got, want, atol=1e-5)


def jnp_rand(shape):
    return np.random.default_rng(0).uniform(-1, 1, shape).astype(np.float32)
