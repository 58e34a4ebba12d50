"""MetricsLogger: formatting, CSV schema, throughput accounting."""

import numpy as np

import jax.numpy as jnp

from mmvae_tpu.train.metrics import MetricsLogger


class TestMetricsLogger:
    def test_stdout_and_values(self):
        lines = []
        lg = MetricsLogger(print_fn=lines.append, frames_per_step=100)
        v1 = lg.log(10, {"loss": jnp.float32(5.5), "bce": jnp.float32(5.0), "kl": jnp.float32(0.5)})
        v2 = lg.log(20, {"loss": jnp.float32(4.0), "bce": jnp.float32(3.5), "kl": jnp.float32(0.5)})
        assert v1["loss"] == 5.5 and "frames_per_sec" not in v1
        assert v2["frames_per_sec"] > 0  # 10 steps x 100 frames / elapsed
        assert "step      10" in lines[0] and "loss 5.50" in lines[0]

    def test_throughput_suppressed(self):
        lg = MetricsLogger(print_fn=lambda s: None, frames_per_step=100)
        lg.log(10, {"loss": jnp.float32(1.0)})
        v = lg.log(20, {"loss": jnp.float32(1.0)}, throughput=False)
        assert "frames_per_sec" not in v

    def test_csv_schema_and_val_columns(self, tmp_path):
        p = tmp_path / "m.csv"
        lg = MetricsLogger(csv_path=str(p), print_fn=lambda s: None)
        lg.log(5, {"loss": jnp.float32(2.0), "val_loss": 1.5})
        lg.close()
        rows = p.read_text().strip().splitlines()
        header = rows[0].split(",")
        assert "val_loss" in header and "loss" in header
        vals = dict(zip(header, rows[1].split(",")))
        assert float(vals["val_loss"]) == 1.5

    def test_extra_keys_ignored_in_csv(self, tmp_path):
        p = tmp_path / "m.csv"
        lg = MetricsLogger(csv_path=str(p), print_fn=lambda s: None)
        lg.log(1, {"loss": jnp.float32(1.0), "weird_metric": 9.0})
        lg.close()
        assert "weird_metric" not in p.read_text()


class TestCSVAppendOnResume:
    def test_append_preserves_history(self, tmp_path):
        """Resume must not truncate the prior run's loss curve (round-1 advisory)."""
        p = tmp_path / "m.csv"
        lg = MetricsLogger(csv_path=str(p), print_fn=lambda s: None)
        lg.log(1, {"loss": jnp.float32(3.0)})
        lg.log(2, {"loss": jnp.float32(2.0)})
        lg.close()
        lg2 = MetricsLogger(csv_path=str(p), print_fn=lambda s: None, append=True)
        lg2.log(3, {"loss": jnp.float32(1.0)})
        lg2.close()
        rows = p.read_text().strip().splitlines()
        assert len(rows) == 4  # one header + three data rows
        assert rows[0].startswith("step")
        steps = [r.split(",")[0] for r in rows[1:]]
        assert steps == ["1", "2", "3"]

    def test_append_on_missing_file_writes_header(self, tmp_path):
        p = tmp_path / "fresh.csv"
        lg = MetricsLogger(csv_path=str(p), print_fn=lambda s: None, append=True)
        lg.log(1, {"loss": jnp.float32(1.0)})
        lg.close()
        rows = p.read_text().strip().splitlines()
        assert rows[0].startswith("step") and len(rows) == 2
