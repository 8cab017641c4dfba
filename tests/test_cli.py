"""CLI-surface tests: the shared ``--platform`` flag and the lazy-import
invariant it depends on.

``--platform cpu`` must let every entry point run without the (possibly
remote/unavailable) TPU backend; that only works if importing the entry
modules never initializes a JAX backend — ``apply_platform`` runs inside
``cli_main``, after the module imports.
"""

from __future__ import annotations

import subprocess
import sys


def _has_platform_flag(parser) -> bool:
    return any("--platform" in a.option_strings for a in parser._actions)


def test_platform_flag_on_every_jax_cli():
    from point2cyl_tpu.eval import evaluator
    from point2cyl_tpu.recon import reconstruct
    from point2cyl_tpu.serve import export as serve_export
    from point2cyl_tpu.train import train_joint, train_pc

    for mod in (evaluator, train_pc, train_joint, reconstruct,
                serve_export):
        assert _has_platform_flag(mod.build_argparser()), mod.__name__


def test_apply_platform_forces_cpu():
    # conftest already forces cpu; applying the same platform must be a
    # no-op (not raise), and the backend must report cpu.
    import jax

    from point2cyl_tpu.core.config import apply_platform

    apply_platform("cpu")
    assert jax.default_backend() == "cpu"


def test_entry_module_imports_do_not_initialize_backend():
    """Importing the package + every entry module must not touch a JAX
    backend (a module-level ``jnp`` constant once did, making every
    import hang when the remote TPU tunnel was down)."""
    code = (
        "import point2cyl_tpu, point2cyl_tpu.ops, "
        "point2cyl_tpu.eval.evaluator, point2cyl_tpu.train.train_pc, "
        "point2cyl_tpu.train.train_joint, point2cyl_tpu.recon.reconstruct, "
        "point2cyl_tpu.serve\n"
        "from jax._src import xla_bridge\n"
        "assert not xla_bridge._backends, list(xla_bridge._backends)\n"
        "print('LAZY_OK')\n"
    )
    proc = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True, text=True, timeout=300,
    )
    assert proc.returncode == 0 and "LAZY_OK" in proc.stdout, (
        proc.stdout[-500:] + proc.stderr[-500:]
    )


def test_bq_oversample_plumbs_to_backbone_config():
    """--bq_oversample reaches the kernels: TrainConfig -> build_model ->
    BackboneConfig (the knob is dead weight if any hop drops it)."""
    from point2cyl_tpu.core.config import TrainConfig
    from point2cyl_tpu.train.train_pc import build_argparser, build_model

    args = build_argparser().parse_args(
        ["--bq_oversample", "8", "--pred_seg", "--pred_normal"]
    )
    assert args.bq_oversample == 8
    cfg = TrainConfig(bq_oversample=args.bq_oversample)
    model = build_model(cfg, 512, 8)
    assert model.cfg.bq_oversample == 8
