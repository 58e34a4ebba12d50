"""Config system: registry completeness vs the contract, override coercion."""

import pytest

from mmvae_tpu.configs import CONFIG_REGISTRY, get_config


class TestRegistry:
    def test_all_five_contract_configs(self):
        """BASELINE.json:6-12 lists exactly these five capabilities."""
        assert set(CONFIG_REGISTRY) == {
            "mlp_vae", "conv_vae", "seq_vae", "pred_vae", "hier_vae",
        }

    def test_contract_hyperparameters(self):
        assert get_config("mlp_vae").model.kwargs["latent_dim"] == 20
        assert get_config("mlp_vae").data.batch_size == 64
        assert get_config("mlp_vae").data.per_frame
        assert get_config("conv_vae").model.kwargs["latent_dim"] == 64
        assert get_config("conv_vae").data.batch_size == 128
        assert get_config("seq_vae").data.seq_len == 20
        assert get_config("pred_vae").model.kwargs["context_len"] == 10
        assert get_config("hier_vae").data.seq_len == 100
        assert get_config("hier_vae").model.kwargs["chunk_len"] == 10


class TestOverrides:
    def test_float_int_bool(self):
        cfg = get_config(
            "mlp_vae",
            ("optim.lr=0.01", "train.steps=77", "data.binarize=false"),
        )
        assert cfg.optim.lr == 0.01
        assert cfg.train.steps == 77
        assert cfg.data.binarize is False

    def test_model_kwargs_override(self):
        cfg = get_config("mlp_vae", ("model.kwargs.latent_dim=5",))
        assert cfg.model.kwargs["latent_dim"] == 5

    def test_tuple_override(self):
        """Comma-separated values coerce to tuples (element type from the
        existing tuple, or int/float inference for new model kwargs)."""
        cfg = get_config(
            "seq_vae",
            (
                "model.kwargs.enc_channels=4,8",
                "model.kwargs.mix=1.5,2.5",
            ),
        )
        assert cfg.model.kwargs["enc_channels"] == (4, 8)
        assert cfg.model.kwargs["mix"] == (1.5, 2.5)

    def test_none_override(self):
        cfg = get_config("mlp_vae", ("train.checkpoint_dir=/tmp/x",))
        assert cfg.train.checkpoint_dir == "/tmp/x"
        cfg.override("train.checkpoint_dir", "none")
        assert cfg.train.checkpoint_dir is None

    def test_bad_key_raises(self):
        with pytest.raises(AttributeError):
            get_config("mlp_vae", ("optim.nonexistent_field_xyz=3",))
        # note: dataclasses allow setattr of new names; guard via getattr probe

    def test_bool_truthy_falsy_literals(self):
        """Round-1 advisory: '1'/'yes' silently became False; now coerce or raise."""
        cfg = get_config("mlp_vae", ("train.resume=1", "data.binarize=no"))
        assert cfg.train.resume is True
        assert cfg.data.binarize is False
        cfg = get_config("mlp_vae", ("train.resume=ON", "data.binarize=off"))
        assert cfg.train.resume is True
        assert cfg.data.binarize is False

    def test_bool_garbage_raises(self):
        with pytest.raises(ValueError):
            get_config("mlp_vae", ("train.resume=maybe",))


class TestCompileCache:
    """utils/compile_cache.py — shared by the CLI, bench.py, __graft_entry__."""

    def test_respects_disable_env(self, monkeypatch, tmp_path):
        import jax

        from mmvae_tpu.utils.compile_cache import enable_persistent_compile_cache

        before = jax.config.jax_compilation_cache_dir
        monkeypatch.setenv("MMVAE_NO_COMPILE_CACHE", "1")
        monkeypatch.setenv("JAX_COMPILATION_CACHE_DIR", str(tmp_path / "never"))
        enable_persistent_compile_cache()
        assert jax.config.jax_compilation_cache_dir == before
        assert not (tmp_path / "never").exists()

    def test_points_jax_at_env_dir(self, monkeypatch, tmp_path):
        import jax

        from mmvae_tpu.utils.compile_cache import enable_persistent_compile_cache

        before = jax.config.jax_compilation_cache_dir
        before_min = jax.config.jax_persistent_cache_min_entry_size_bytes
        target = tmp_path / "xla"
        monkeypatch.delenv("MMVAE_NO_COMPILE_CACHE", raising=False)
        monkeypatch.setenv("JAX_COMPILATION_CACHE_DIR", str(target))
        try:
            enable_persistent_compile_cache()
            assert jax.config.jax_compilation_cache_dir == str(target)
            assert target.is_dir()
        finally:
            # Restore BOTH knobs the helper sets; leaving the min-entry-size
            # at -1 would leak config into the rest of the test session.
            jax.config.update("jax_compilation_cache_dir", before)
            jax.config.update(
                "jax_persistent_cache_min_entry_size_bytes", before_min
            )
