"""Config fidelity: every key of every published reference JSON must be
consumed (or explicitly superseded) — silently dropped keys were a round-1
parity bug. Reference: BigGAN_PyTorch/utils.py:39-940 flag surface,
run.py:40-43 batch derivation, config_files/**."""

import glob
import json

import numpy as np
import pytest

from ic_gan_tpu.cli.config import split_config, validate_config

BIGGAN_JSONS = sorted(
    glob.glob("/root/reference/BigGAN_PyTorch/config_files/**/*.json",
              recursive=True)
)
SG2_JSONS = sorted(
    glob.glob("/root/reference/stylegan2_ada_pytorch/config_files/**/*.json",
              recursive=True)
)


def test_reference_json_inventory_present():
    assert len(BIGGAN_JSONS) == 21 and len(SG2_JSONS) == 4


@pytest.mark.parametrize("path", BIGGAN_JSONS, ids=lambda p: p.split("/")[-1])
def test_biggan_json_no_dropped_keys(path):
    with open(path) as f:
        cfg = json.load(f)
    problems = validate_config(cfg, backbone="biggan")
    assert problems == []
    model, train, trainer, data = split_config(cfg)
    # Spot-check the mapping round-trips key values.
    assert model.resolution == cfg["resolution"]
    assert train.num_D_accumulations == cfg["num_D_accumulations"]
    assert trainer.use_ema == cfg.get("use_ema", False)
    assert data["which_nn_balance"] == cfg.get(
        "which_knn_balance", "instance_balance"
    )


@pytest.mark.parametrize("path", SG2_JSONS, ids=lambda p: p.split("/")[-1])
def test_sg2_json_no_dropped_keys(path):
    with open(path) as f:
        cfg = json.load(f)
    assert validate_config(cfg, backbone="stylegan2") == []
    from ic_gan_tpu.cli.train_stylegan2 import setup_configs

    model, train, loop = setup_configs(cfg)
    assert model.img_resolution == cfg["resolution"]
    assert train.r1_gamma == cfg.get("gamma", train.r1_gamma)


def test_unknown_key_warns_and_strict_raises():
    with pytest.warns(UserWarning, match="unknown config key"):
        problems = validate_config({"definitely_not_a_flag": 1})
    assert problems
    with pytest.raises(ValueError):
        with pytest.warns(UserWarning):
            validate_config({"definitely_not_a_flag": 1}, strict=True)


def test_default_only_key_warns_on_nondefault():
    with pytest.warns(UserWarning, match="only supported at its reference"):
        assert validate_config({"G_param": "ortho_reg"})
    assert validate_config({"G_param": "SN"}) == []
    # Formerly default-only, now consumed (r3): no warning.
    for k, v in (("norm_style", "groupnorm"), ("split_D", True),
                 ("G_init", "N02"), ("skip_init", True), ("augment", True)):
        assert validate_config({k: v}) == []


def test_global_batch_derivation():
    """run.py:40-43 semantics: JSON batch_size is per-rank per-accumulation;
    the mesh batch is the global microbatch bs * n_nodes * n_gpus."""
    with open(
        "/root/reference/BigGAN_PyTorch/config_files/ImageNet/IC-GAN/"
        "icgan_res256.json"
    ) as f:
        cfg = json.load(f)
    _, train, trainer, _ = split_config(cfg)
    assert trainer.world_size == 32  # 4 nodes x 8 GPUs
    assert trainer.batch_size == 16 * 32
    # Per-step image count matches the reference global batch of 2048.
    assert trainer.batch_size * train.num_D_steps * train.num_D_accumulations \
        == 2048


def test_sn_bn_eps_and_sv_counts_plumb_to_model():
    cfg = {
        "resolution": 32, "n_classes": 4, "G_ch": 4, "D_ch": 4, "dim_z": 8,
        "G_attn": "0", "D_attn": "0", "shared_dim": 8, "class_cond": True,
        "instance_cond": False, "SN_eps": 1e-4, "BN_eps": 1e-3,
        "num_G_SVs": 2, "num_D_SVs": 3, "num_G_SV_itrs": 2,
    }
    model, _, _, _ = split_config(cfg)
    assert model.SN_eps == 1e-4 and model.BN_eps == 1e-3
    assert model.num_G_SVs == 2 and model.num_D_SVs == 3
    assert model.num_SV_itrs == 2

    # The SV count must reach the layers: sn collection u has num_svs rows.
    import jax
    import jax.numpy as jnp
    from flax.traverse_util import flatten_dict

    from ic_gan_tpu.models.biggan import Generator, Discriminator

    g = Generator(model)
    vs = g.init(jax.random.PRNGKey(0), jnp.zeros((2, model.effective_dim_z)),
                jnp.zeros((2,), jnp.int32), None)
    u_shapes = {p: v.shape for p, v in flatten_dict(vs["sn"]).items()
                if p[-1] == "u"}
    assert u_shapes and all(s[0] == 2 for s in u_shapes.values()), u_shapes
    d = Discriminator(model)
    dvs = d.init(jax.random.PRNGKey(0), jnp.zeros((2, 32, 32, 3)),
                 jnp.zeros((2,), jnp.int32), None)
    du = {p: v.shape for p, v in flatten_dict(dvs["sn"]).items()
          if p[-1] == "u"}
    assert du and all(s[0] == 3 for s in du.values()), du


# --- experiment auto-naming (ref utils.py:1602-1650) ------------------------


def _reference_name_oracle(cfg):
    """Run the reference's own name builder as the oracle.

    The fork's ``name_from_config`` builds ``name`` but drops the upstream
    ``return name`` (and the ``--dataset`` flag it reads), so we exec its
    source with the return restored and ``dataset`` supplied the way the
    fork derives dataset/moment names ({I|COCO}{res}_hdf5,
    ``trainer.py:303-307``).
    """
    import inspect
    import sys
    import textwrap
    import types

    # The reference utils.py imports torchvision (absent here) at module
    # scope for its data-loader helpers; stub it — name building needs none
    # of it.
    for name in ("torchvision", "torchvision.transforms",
                 "torchvision.datasets"):
        sys.modules.setdefault(name, types.ModuleType(name))
    sys.path.insert(0, "/root/reference/BigGAN_PyTorch")
    try:
        import utils as ref_utils
    finally:
        sys.path.pop(0)
    src = textwrap.dedent(inspect.getsource(ref_utils.name_from_config))
    assert "return" not in src  # the fork quirk this oracle patches around
    ns = {}
    exec(src + "\n    return name\n", ns)

    # Reference parser defaults overlaid with the JSON (run.py:30-43).
    parser = ref_utils.prepare_parser()
    full = vars(parser.parse_args([]))
    full.update(cfg)
    prefix = "I" if full.get("which_dataset", "imagenet") == "imagenet" else "COCO"
    full["dataset"] = "%s%d_hdf5" % (prefix, full.get("resolution", 64))
    return ns["name_from_config"](full)


@pytest.mark.parametrize(
    "path",
    [p for p in BIGGAN_JSONS if "IC-GAN" in p or "BigGAN" in p][:6],
    ids=lambda p: p.split("/")[-1],
)
def test_experiment_autoname_matches_reference(path):
    from ic_gan_tpu.cli.config import name_from_config

    with open(path) as f:
        cfg = json.load(f)
    assert name_from_config(cfg) == _reference_name_oracle(cfg)


def test_autoname_used_when_experiment_name_unset():
    from ic_gan_tpu.cli.config import name_from_config

    with open(BIGGAN_JSONS[0]) as f:
        cfg = json.load(f)
    cfg.pop("experiment_name", None)
    _, _, trainer, _ = split_config(cfg)
    assert trainer.experiment_name == name_from_config(cfg)
    # Explicit names still win (trainer.py:124-127).
    cfg["experiment_name"] = "explicit"
    _, _, trainer, _ = split_config(cfg)
    assert trainer.experiment_name == "explicit"
