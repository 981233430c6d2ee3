"""HF-CLIP api tower: pad-mask semantics + eos pooling (unit-level; the HF
checkpoint itself is not downloadable in this environment)."""
import numpy as np
import jax
import jax.numpy as jnp

from vlsa_tpu.models.text_encoder import TextTower, generate_pseudo_tokens

RNG = np.random.default_rng(6)


def test_hf_pad_masking_invariance():
    """Changing tokens AFTER the eos must not change pooled features (they are
    masked keys and pooling reads the eos position)."""
    tower = TextTower(width=32, heads=4, layers=2, context_length=12,
                      vocab_size=50, output_dim=16, api="HF")
    eos = 49
    ids = np.zeros((2, 12), np.int64)
    ids[0, :6] = [1, 5, 6, 7, 8, eos]
    ids[1, :9] = [1, 9, 10, 11, 12, 13, 14, 15, eos]
    pseudo = generate_pseudo_tokens(ids, "HF", eos_token_id=eos)
    emb_params = tower.init(jax.random.PRNGKey(0),
                            prompts_embedding=jnp.zeros((2, 12, 32)),
                            prompts_pseudo_tokens=jnp.asarray(pseudo))["params"]

    def run(ids_arr):
        emb = jnp.asarray(np.asarray(emb_params["token_embedding"])[ids_arr])
        return np.asarray(tower.apply({"params": emb_params},
                                      prompts_embedding=emb,
                                      prompts_pseudo_tokens=jnp.asarray(pseudo)))

    base = run(ids)
    ids_mut = ids.copy()
    ids_mut[0, 7:] = 33  # mutate padding-region tokens (beyond eos)
    mut = run(ids_mut)
    # row 0: pads are masked keys AND the pad embeddings only feed masked
    # positions, so pooled output is unchanged; row 1 untouched
    np.testing.assert_allclose(mut[1], base[1], rtol=1e-6)
    np.testing.assert_allclose(mut[0], base[0], rtol=1e-4, atol=1e-6)


def test_bf16_tower_close_to_f32():
    tower32 = TextTower(width=64, heads=4, layers=2, context_length=16,
                        vocab_size=60, output_dim=24, api="CONCH")
    params = tower32.init(jax.random.PRNGKey(1),
                          prompts_embedding=jnp.zeros((2, 15, 64)),
                          prompts_pseudo_tokens=jnp.zeros((2, 15), jnp.int32)
                          .at[:, :5].set(jnp.arange(1, 6)))["params"]
    tower16 = TextTower(width=64, heads=4, layers=2, context_length=16,
                        vocab_size=60, output_dim=24, api="CONCH",
                        dtype="bfloat16")
    emb = jnp.asarray(RNG.normal(0, 0.02, size=(2, 15, 64)).astype(np.float32))
    pseudo = jnp.zeros((2, 15), jnp.int32).at[:, :5].set(jnp.arange(1, 6))
    o32 = np.asarray(tower32.apply({"params": params}, prompts_embedding=emb,
                                   prompts_pseudo_tokens=pseudo))
    o16 = np.asarray(tower16.apply({"params": params}, prompts_embedding=emb,
                                   prompts_pseudo_tokens=pseudo))
    # bf16 matmuls with f32 accumulation: deviations stay a few percent of
    # the output scale (per-element relative error blows up near zeros)
    assert np.max(np.abs(o32 - o16)) / max(o32.std(), 1e-6) < 5e-2


def test_ema():
    from vlsa_tpu.optim import ModelEma
    p0 = {"w": jnp.ones((3,))}
    ema = ModelEma(p0, decay=0.5)
    ema.update({"w": jnp.zeros((3,))})
    np.testing.assert_allclose(np.asarray(ema.shadow["w"]), 0.5 * np.ones(3))
    ema.update({"w": jnp.zeros((3,))})
    np.testing.assert_allclose(np.asarray(ema.shadow["w"]), 0.25 * np.ones(3))


def test_remat_tower_same_output():
    pseudo = jnp.zeros((1, 15), jnp.int32).at[:, :5].set(jnp.arange(1, 6))
    emb = jnp.asarray(RNG.normal(0, 0.02, size=(1, 15, 32)).astype(np.float32))
    t1 = TextTower(width=32, heads=4, layers=2, context_length=16,
                   vocab_size=40, output_dim=16, api="CONCH")
    params = t1.init(jax.random.PRNGKey(2), prompts_embedding=emb,
                     prompts_pseudo_tokens=pseudo)["params"]
    t2 = TextTower(width=32, heads=4, layers=2, context_length=16,
                   vocab_size=40, output_dim=16, api="CONCH", remat=True)
    o1 = t1.apply({"params": params}, prompts_embedding=emb,
                  prompts_pseudo_tokens=pseudo)
    o2 = t2.apply({"params": params}, prompts_embedding=emb,
                  prompts_pseudo_tokens=pseudo)
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), rtol=1e-6)
