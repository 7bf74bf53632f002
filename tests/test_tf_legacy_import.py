"""Legacy TF StyleGAN2 pickle conversion vs the reference oracle.

Builds a synthetic TF-era snapshot (a 3-tuple of ``dnnlib.tflib.network``
stubs with correctly-shaped HWIO/(in,out) variables), then:

  1. converts it with the reference ``legacy.load_network_pkl`` (the oracle —
     instantiating the torch nets also validates every synthetic shape);
  2. converts it with ``ic_gan_tpu.io.stylegan_import.load_network_pkl``
     (pure stub unpickling, no TF/torch needed);
  3. asserts both land on identical Flax variables, and that the resurrected
     generator forward matches the torch oracle.

Reference semantics: ``stylegan2_ada_pytorch/legacy.py:27-371``.
"""

import io
import pickle
import sys
import types

import numpy as np
import pytest

sys.path.insert(0, "/root/reference")
sys.path.insert(0, "/root/reference/stylegan2_ada_pytorch")

torch = pytest.importorskip("torch")

RES = 32
FMAP_BASE = 256   # torch channel_base = 512
FMAP_MAX = 64
ZDIM = WDIM = 64


def _ch(res):
    return min((FMAP_BASE * 2) // res, FMAP_MAX)


def _network_stub_cls():
    """A class pickled as ``dnnlib.tflib.network.Network`` (injected as a
    fake submodule of the reference's real dnnlib package)."""
    import dnnlib

    modname = "dnnlib.tflib.network"
    if modname not in sys.modules:
        tflib = types.ModuleType("dnnlib.tflib")
        netmod = types.ModuleType(modname)

        class Network:
            pass

        Network.__module__ = modname
        Network.__qualname__ = "Network"
        netmod.Network = Network
        tflib.network = netmod
        dnnlib.tflib = tflib
        sys.modules["dnnlib.tflib"] = tflib
        sys.modules[modname] = netmod
    return sys.modules[modname].Network


def _net(rng, static_kwargs, variables, components=None):
    cls = _network_stub_cls()
    n = cls()
    n.version = 4
    n.static_kwargs = static_kwargs
    n.variables = [(k, np.asarray(rng.randn(*s), np.float32) * 0.1)
                   for k, s in variables]
    n.components = components or {}
    return n


def _make_tf_generator(rng):
    mapping = _net(rng, {}, [
        ("Dense0/weight", (ZDIM, WDIM)), ("Dense0/bias", (WDIM,)),
        ("Dense1/weight", (WDIM, WDIM)), ("Dense1/bias", (WDIM,)),
    ])
    syn_vars = [
        ("4x4/Const/const", (1, _ch(4), 4, 4)),
        ("4x4/Conv/weight", (3, 3, _ch(4), _ch(4))),
        ("4x4/Conv/bias", (_ch(4),)),
        ("4x4/Conv/noise_strength", ()),
        ("4x4/Conv/mod_weight", (WDIM, _ch(4))),
        ("4x4/Conv/mod_bias", (_ch(4),)),
        ("4x4/ToRGB/weight", (1, 1, _ch(4), 3)),
        ("4x4/ToRGB/bias", (3,)),
        ("4x4/ToRGB/mod_weight", (WDIM, _ch(4))),
        ("4x4/ToRGB/mod_bias", (_ch(4),)),
        ("noise0", (1, 1, 4, 4)),
    ]
    for r in (8, 16, 32):
        ci, co = _ch(r // 2), _ch(r)
        k = int(np.log2(r))
        syn_vars += [
            (f"{r}x{r}/Conv0_up/weight", (3, 3, ci, co)),
            (f"{r}x{r}/Conv0_up/bias", (co,)),
            (f"{r}x{r}/Conv0_up/noise_strength", ()),
            (f"{r}x{r}/Conv0_up/mod_weight", (WDIM, ci)),
            (f"{r}x{r}/Conv0_up/mod_bias", (ci,)),
            (f"noise{2 * k - 5}", (1, 1, r, r)),
            (f"{r}x{r}/Conv1/weight", (3, 3, co, co)),
            (f"{r}x{r}/Conv1/bias", (co,)),
            (f"{r}x{r}/Conv1/noise_strength", ()),
            (f"{r}x{r}/Conv1/mod_weight", (WDIM, co)),
            (f"{r}x{r}/Conv1/mod_bias", (co,)),
            (f"noise{2 * k - 4}", (1, 1, r, r)),
            (f"{r}x{r}/ToRGB/weight", (1, 1, co, 3)),
            (f"{r}x{r}/ToRGB/bias", (3,)),
            (f"{r}x{r}/ToRGB/mod_weight", (WDIM, co)),
            (f"{r}x{r}/ToRGB/mod_bias", (co,)),
        ]
    synthesis = _net(rng, {}, syn_vars)
    kwargs = dict(
        latent_size=ZDIM, dlatent_size=WDIM, resolution=RES, num_channels=3,
        mapping_layers=2, fmap_base=FMAP_BASE, fmap_max=FMAP_MAX,
        nonlinearity="lrelu", resample_kernel=[1, 3, 3, 1],
    )
    return _net(rng, kwargs, [("dlatent_avg", (WDIM,))],
                {"mapping": mapping, "synthesis": synthesis})


def _make_tf_discriminator(rng):
    vars_ = [("32x32/FromRGB/weight", (1, 1, 3, _ch(32))),
             ("32x32/FromRGB/bias", (_ch(32),))]
    for r in (32, 16, 8):
        ci, co = _ch(r), _ch(r // 2)
        vars_ += [
            (f"{r}x{r}/Conv0/weight", (3, 3, ci, ci)),
            (f"{r}x{r}/Conv0/bias", (ci,)),
            (f"{r}x{r}/Conv1_down/weight", (3, 3, ci, co)),
            (f"{r}x{r}/Conv1_down/bias", (co,)),
            (f"{r}x{r}/Skip/weight", (1, 1, ci, co)),
        ]
    vars_ += [
        ("4x4/Conv/weight", (3, 3, _ch(4) + 1, _ch(4))),
        ("4x4/Conv/bias", (_ch(4),)),
        ("4x4/Dense0/weight", (_ch(4) * 16, _ch(4))),
        ("4x4/Dense0/bias", (_ch(4),)),
        ("Output/weight", (_ch(4), 1)),
        ("Output/bias", (1,)),
    ]
    kwargs = dict(
        resolution=RES, num_channels=3, fmap_base=FMAP_BASE,
        fmap_max=FMAP_MAX, nonlinearity="lrelu",
        resample_kernel=[1, 3, 3, 1], mbstd_group_size=4,
    )
    return _net(rng, kwargs, vars_)


@pytest.fixture(scope="module")
def tf_pickle_path(tmp_path_factory):
    rng = np.random.RandomState(0)
    G = _make_tf_generator(rng)
    D = _make_tf_discriminator(rng)
    Gs = _make_tf_generator(np.random.RandomState(1))
    path = tmp_path_factory.mktemp("legacy") / "tf_snapshot.pkl"
    with open(path, "wb") as f:
        pickle.dump((G, D, Gs), f)
    return str(path)


def _flatten(tree, prefix=()):
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(_flatten(v, prefix + (k,)))
        else:
            out[prefix + (k,)] = np.asarray(v)
    return out


class _patched_ref_networks:
    """The IC-GAN fork's ``networks.Generator/Discriminator`` grew a required
    ``h_dim`` ctor arg that ``legacy.py``'s TF conversion never passes — the
    reference's own TF path is latently broken there.  Shim ``h_dim=0`` (TF
    snapshots predate instance conditioning) so the oracle runs."""

    def __enter__(self):
        import functools

        from training import networks

        self._orig = (networks.Generator, networks.Discriminator)
        networks.Generator = functools.partial(networks.Generator, h_dim=0)
        networks.Discriminator = functools.partial(
            networks.Discriminator, h_dim=0
        )
        return self

    def __exit__(self, *exc):
        from training import networks

        networks.Generator, networks.Discriminator = self._orig


def test_tf_pickle_matches_reference_oracle(tf_pickle_path):
    import legacy as ref_legacy

    from ic_gan_tpu.io.stylegan_import import convert_state_dict, load_network_pkl

    with open(tf_pickle_path, "rb") as f, _patched_ref_networks():
        ref_data = ref_legacy.load_network_pkl(f)

    ours = load_network_pkl(tf_pickle_path)
    assert set(ours) >= {"G", "D", "G_ema"}

    for name in ("G", "D", "G_ema"):
        module = ref_data[name]
        oracle_sd = {k: v.detach().cpu().numpy()
                     for k, v in module.state_dict().items()}
        want = _flatten(convert_state_dict(oracle_sd))
        got = _flatten(ours[name][0])
        assert set(got) == set(want), (
            set(got) ^ set(want), name)
        for key in want:
            np.testing.assert_allclose(
                got[key], want[key], atol=0, rtol=0, err_msg=f"{name}/{key}")


def test_torch_persistence_snapshot_loads(tmp_path):
    """Torch persistence snapshots (ref ``training_loop.py:618-646``) must
    fall through the stub unpickler (whose ``find_class`` cannot resolve
    ``torch_utils.persistence`` classes) to the torch branch — regression
    test for the round-2 stub-first change that made this path crash."""
    from training import networks

    from ic_gan_tpu.io.stylegan_import import load_network_pkl

    G = networks.Generator(
        z_dim=ZDIM, c_dim=0, w_dim=WDIM, h_dim=0, img_resolution=RES,
        img_channels=3,
        mapping_kwargs=dict(num_layers=2),
        synthesis_kwargs=dict(channel_base=2 * FMAP_BASE,
                              channel_max=FMAP_MAX, num_fp16_res=0,
                              conv_clamp=None),
    )
    path = tmp_path / "network-snapshot.pkl"
    with open(path, "wb") as f:
        pickle.dump({"G_ema": G}, f)

    out = load_network_pkl(str(path))
    assert "G_ema" in out
    variables, kw = out["G_ema"]
    assert kw["img_resolution"] == RES and kw["z_dim"] == ZDIM
    flat = _flatten(variables)
    # Converter drops constant resample_filter buffers; spot-check a real
    # weight survives with the (in, out) layout flip.
    want = G.state_dict()["mapping.fc0.weight"].detach().numpy().T
    got = flat[("params", "mapping", "fc0", "weight")]
    assert np.allclose(got, want)


def test_tf_generator_forward_parity(tf_pickle_path):
    import jax
    import jax.numpy as jnp
    import legacy as ref_legacy

    from ic_gan_tpu.io.stylegan_import import load_network_pkl
    from ic_gan_tpu.models import stylegan2 as sg2

    with open(tf_pickle_path, "rb") as f, _patched_ref_networks():
        torch_G = ref_legacy.load_network_pkl(f)["G_ema"].eval()

    variables, kw = load_network_pkl(tf_pickle_path)["G_ema"]
    cfg = sg2.StyleGAN2Config(
        img_resolution=kw["img_resolution"], z_dim=kw["z_dim"],
        c_dim=kw["c_dim"], h_dim=0, w_dim=kw["w_dim"],
        channel_base=kw["synthesis_kwargs"]["channel_base"],
        channel_max=kw["synthesis_kwargs"]["channel_max"],
        num_mapping_layers=kw["mapping_kwargs"]["num_layers"],
        num_fp16_res=0, conv_clamp=None,
    )
    g = sg2.Generator(cfg)
    z = np.random.RandomState(7).randn(2, ZDIM).astype(np.float32)
    with torch.no_grad():
        ref = torch_G(torch.from_numpy(z), None, None, noise_mode="const").numpy()
    got = g.apply(
        {"params": variables["params"], **{
            c: variables[c] for c in ("noise", "batch_stats") if c in variables
        }},
        jnp.asarray(z), None, None, noise_mode="const",
    )
    got = np.transpose(np.asarray(got), (0, 3, 1, 2))
    np.testing.assert_allclose(got, ref, atol=5e-4)
