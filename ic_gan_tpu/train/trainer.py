"""BigGAN/IC-GAN trainer: epoch loop, eval, checkpointing, early stopping.

Orchestration parity with ``BigGAN_PyTorch/trainer.py:41-541`` re-designed
around a single jitted train step on a pjit mesh:

- per-epoch loop over host-sampled batches (dataset conditioning sampling
  stays on host, exactly like the reference's DataLoader; the slabs are
  device_put with the microbatch axis sharded over the ``data`` mesh axis);
- deterministic seeding per (epoch, step) (ref ``trainer.py:113-119``);
- test every ``test_every`` epochs → IS/FID (+PRDC) via a pluggable eval fn,
  best-checkpoint save on IS or FID (ref ``train_fns.py:290-362``);
- early stop on FID patience and divergence stop when ``2·IS < best_IS``
  (ref ``trainer.py:514-540``);
- rotating ``copy%d`` saves (ref ``train_fns.py:219-236``).
"""

from __future__ import annotations

import dataclasses
import os
import time
from typing import Any, Callable, Dict, Optional

import numpy as np

import jax
import jax.numpy as jnp

from ic_gan_tpu.data.datasets import HDF5Dataset
from ic_gan_tpu.io.checkpoint import load_checkpoint, save_checkpoint
from ic_gan_tpu.models.biggan import BigGANConfig, Discriminator, Generator
from ic_gan_tpu.parallel.mesh import (
    is_main_process,
    local_batch_size,
    make_mesh,
    replicated,
    shard_batch,
)
from ic_gan_tpu.train.state import GANTrainState
from ic_gan_tpu.train.step import TrainConfig, make_train_step
from ic_gan_tpu.utils.logging import MetricLogger, MetricsLogger, write_metadata


@dataclasses.dataclass
class TrainerConfig:
    experiment_name: str = "icgan_experiment"
    weights_root: str = "weights"
    logs_root: str = "logs"
    num_epochs: int = 100
    test_every: int = 5
    save_every: int = 1
    num_save_copies: int = 2
    num_best_copies: int = 2
    which_best: str = "FID"
    es_patience: int = 50
    seed: int = 0
    deterministic_run: bool = True
    batch_size: int = 64          # global per-microbatch (per accumulation)
    n_devices: Optional[int] = None
    # Reference eval-mode flags (utils.py:508-537): sample from the EMA copy,
    # and accumulate standing BN statistics before each eval.
    use_ema: bool = True
    accumulate_stats: bool = False
    num_standing_accumulations: int = 16
    # Divergence stop gate (ref trainer.py:514: only with stop_when_diverge).
    stop_when_diverge: bool = False
    # Log spectral-norm singular-value estimates every N iterations
    # (ref utils.py:1590-1598 + sv_log_interval flag; 0 disables unless a
    # log_*_spectra flag is set, then the reference default interval 10
    # applies).  log_G_spectra/log_D_spectra select which net's SVs go to
    # the per-metric logs (ref flags utils.py:857-876).
    sv_log_interval: int = 0
    log_G_spectra: bool = False
    log_D_spectra: bool = False
    # Train-metrics jsonl cadence.  The reference writes every iteration
    # (trainer.py:468); on the relay TPU a per-step metrics fetch is a
    # device→host round trip, so default to every 100 steps.  Set to 1 for
    # reference-exact logging.
    log_every: int = 100
    # Weight-init styles (ref ``init_weights``, BigGAN.py:294-345): "ortho"
    # (the construction default), "N02", "glorot"/"xavier".  ``skip_init``
    # skips the post-init re-draw entirely — values are don't-care when a
    # checkpoint load immediately follows (ref utils.py:382-388).
    G_init: str = "ortho"
    D_init: str = "ortho"
    skip_init: bool = False
    # Generator label distribution for class-conditional models without
    # instance features (ref ``prepare_z_y`` + ``sample_conditioning_values``,
    # ``data_utils/utils.py:830-1016``; wiring ``trainer.py:264-334``):
    # uniform by default; ``longtail_gen`` draws from the empirical class
    # distribution; ``custom_distrib_gen`` tempers it with softmax(log p / T);
    # ``constant_conditioning`` fixes every generator label to 0.
    longtail_gen: bool = False
    custom_distrib_gen: bool = False
    longtail_temperature: float = 1.0
    constant_conditioning: bool = False
    # Optional npy of per-class probabilities (the reference hardcodes
    # ``imagenet_lt/imagenet_lt_class_prob.npy``, absent from its checkout);
    # default: derive the empirical distribution from the dataset labels.
    class_probabilities: Optional[str] = None
    # Conditioning-draw balancing (ref trainer.py:336-371, gated on
    # longtail & use_balanced_sampler & instance_cond).
    longtail: bool = False
    use_balanced_sampler: bool = False
    # Informational: reference world size (n_nodes * n_gpus_per_node) the
    # global batch derivation came from.
    world_size: int = 1
    # TensorBoard event files next to the jsonl logs (ref
    # training_loop.py:389-396 enables TB when importable; ``no_tb`` off
    # switch). Written natively — no tensorboard/TF dependency.
    enable_tb: bool = True
    # Capture a jax.profiler trace of steps [profile_start, profile_start+3)
    # into this directory (tensorboard-viewable) — the reference's
    # record_function/CUDA-event instrumentation equivalent (SURVEY.md §5.1).
    profile_dir: Optional[str] = None
    profile_start: int = 10


class Trainer:
    """Drives IC-GAN BigGAN training end-to-end."""

    def __init__(
        self,
        model_cfg: BigGANConfig,
        train_cfg: TrainConfig,
        trainer_cfg: TrainerConfig,
        dataset: HDF5Dataset,
        eval_fn: Optional[Callable] = None,
        sampling_weights: Optional[np.ndarray] = None,
    ):
        self.mcfg = model_cfg
        self.tcfg = train_cfg
        self.cfg = trainer_cfg
        self.dataset = dataset
        self.eval_fn = eval_fn
        self.sampling_weights = sampling_weights

        from ic_gan_tpu.models.biggan_deep import (
            BigGANDeepConfig,
            Discriminator as DeepDiscriminator,
            Generator as DeepGenerator,
        )

        if isinstance(model_cfg, BigGANDeepConfig):
            self.g = DeepGenerator(model_cfg)
            self.d = DeepDiscriminator(model_cfg)
        else:
            self.g = Generator(model_cfg)
            self.d = Discriminator(model_cfg)
        self.mesh = make_mesh(
            trainer_cfg.n_devices, batch_size=trainer_cfg.batch_size
        )
        self.step_fn = jax.jit(
            make_train_step(
                self.g.apply, self.d.apply, train_cfg, model_cfg.effective_dim_z
            ),
            donate_argnums=(0,),
        )

        rng = jax.random.PRNGKey(trainer_cfg.seed)
        mb = trainer_cfg.batch_size
        z = jnp.zeros((mb, model_cfg.effective_dim_z))
        feats = (
            jnp.zeros((mb, model_cfg.instance_sz))
            if model_cfg.instance_cond
            else None
        )
        label = jnp.zeros((mb,), jnp.int32) if model_cfg.class_cond else None
        g_vars = self.g.init(rng, z, label, feats, train=True)
        x = jnp.zeros((mb, model_cfg.resolution, model_cfg.resolution, 3))
        d_vars = self.d.init(rng, x, label, feats, train=True)
        if not trainer_cfg.skip_init:
            from ic_gan_tpu.models.layers import apply_weight_init

            # One jitted call per net: an un-jitted re-draw is one relay
            # round trip per leaf on the remote TPU backend (CLAUDE.md).
            redraw = jax.jit(apply_weight_init, static_argnames="style")
            if trainer_cfg.G_init != "ortho":
                g_vars["params"] = redraw(
                    g_vars["params"], jax.random.fold_in(rng, 1),
                    style=trainer_cfg.G_init,
                )
            if trainer_cfg.D_init != "ortho":
                d_vars["params"] = redraw(
                    d_vars["params"], jax.random.fold_in(rng, 2),
                    style=trainer_cfg.D_init,
                )
        self.state = GANTrainState.create(
            g_vars, d_vars, train_cfg.g_optimizer(), train_cfg.d_optimizer()
        )

        # Multi-host (pod) support: replicate the train state globally and
        # decorrelate each host's data sampling — the per-host feeding +
        # rank-0 guards that replace the reference's DDP machinery
        # (trainer.py:84-101, 520-541; SURVEY.md §2.3).
        self.n_proc = jax.process_count()
        self.is_main = is_main_process()
        if self.n_proc > 1:
            repl = replicated(self.mesh)
            self.state = jax.tree.map(
                lambda a: jax.make_array_from_process_local_data(
                    repl, np.asarray(a)
                ),
                self.state,
            )
            self.dataset.rng = np.random.default_rng(
                trainer_cfg.seed + 100003 * jax.process_index()
            )

        # Conditioning-draw weights (ref trainer.py:336-371): separate from
        # the real-batch balanced sampler.  nnclass_balance takes per-CLASS
        # probabilities — the reference's softmax of the raw class
        # probabilities (its quirk: exp(p/T), not exp(log p/T),
        # trainer.py:366-371); instance/center balance takes the per-sample
        # weights.  Published configs all run with use_balanced_sampler off.
        self.cond_weights = None
        if (trainer_cfg.longtail and trainer_cfg.use_balanced_sampler
                and model_cfg.instance_cond):
            if dataset.which_nn_balance == "nnclass_balance":
                p = self._class_probabilities()
                w = np.exp(p / trainer_cfg.longtail_temperature)
                self.cond_weights = w / w.sum()
            else:
                self.cond_weights = sampling_weights

        self.history: Dict[str, Any] = {
            "itr": 0, "epoch": 0, "best_IS": 0.0, "best_FID": float("inf"),
            "save_num": 0, "save_best_num": 0, "epochs_no_improvement": 0,
        }
        os.makedirs(trainer_cfg.weights_root, exist_ok=True)
        logs_dir = os.path.join(trainer_cfg.logs_root, trainer_cfg.experiment_name)
        os.makedirs(logs_dir, exist_ok=True)
        self.train_log = MetricsLogger(
            os.path.join(logs_dir, f"{trainer_cfg.experiment_name}_log.jsonl")
        )
        self.test_log = MetricsLogger(
            os.path.join(logs_dir, f"{trainer_cfg.experiment_name}_test_log.jsonl")
        )
        self.metric_log = MetricLogger(logs_dir)
        self.tb = None
        if trainer_cfg.enable_tb and self.is_main:
            from ic_gan_tpu.utils.tensorboard import SummaryWriter

            self.tb = SummaryWriter(os.path.join(logs_dir, "tb"))
        write_metadata(
            logs_dir, trainer_cfg.experiment_name,
            {"model": dataclasses.asdict(model_cfg) | {"dtype": str(model_cfg.dtype)},
             "train": dataclasses.asdict(train_cfg),
             "trainer": dataclasses.asdict(trainer_cfg)},
        )

    # -- data ---------------------------------------------------------------

    def _class_probabilities(self) -> np.ndarray:
        """Per-class probability vector: the ``class_probabilities`` npy when
        given, else the dataset's empirical label distribution (identical for
        a matching dump — the reference ships no npy in its checkout)."""
        cached = getattr(self, "_class_prob_cache", None)
        if cached is not None:
            return cached
        if self.cfg.class_probabilities:
            p = np.load(self.cfg.class_probabilities, allow_pickle=True)
            p = np.asarray(p, np.float64).reshape(-1)
        else:
            labels = self.dataset.get_label(self.dataset.possible_sampling_idxs)
            p = np.bincount(
                np.asarray(labels).reshape(-1), minlength=self.mcfg.n_classes
            ).astype(np.float64)
        p = p / p.sum()
        self._class_prob_cache = p
        return p

    def _sample_gen_labels(self, n: int) -> np.ndarray:
        """Generator labels for class-only models (ref
        ``sample_conditioning_values``, ``utils.py:879-890``: the y
        distribution from ``prepare_z_y``)."""
        from ic_gan_tpu.data.distributions import sample_gen_labels

        c = self.cfg
        needs_probs = c.longtail_gen or c.custom_distrib_gen
        return sample_gen_labels(
            self.dataset.rng, n, self.mcfg.n_classes,
            longtail_gen=c.longtail_gen,
            custom_distrib_gen=c.custom_distrib_gen,
            longtail_temperature=c.longtail_temperature,
            constant_conditioning=c.constant_conditioning,
            class_prob=self._class_probabilities() if needs_probs else None,
        )

    def _sample_gen_conditioning(self, n: int):
        """One (labels, feats) generator-conditioning draw — the dataset
        samplers when instance features condition the model, the y
        distribution otherwise (ref ``sample_conditioning_values`` dispatch,
        ``utils.py:879-901``)."""
        if self.mcfg.instance_cond:
            if self.dataset.which_nn_balance == "instance_balance":
                return self.dataset.sample_conditioning_instance_balance(
                    n, self.cond_weights
                )
            return self.dataset.sample_conditioning_nnclass_balance(
                n, self.cond_weights, num_classes=self.mcfg.n_classes
            )
        if self.mcfg.class_cond:
            return self._sample_gen_labels(n), None
        return None, None

    def make_batch(self):
        """Assemble the slab batch consumed by the train step: nD microbatches
        of reals + nD+accG fresh generator conditionings (ref
        ``train_fns.py:62-163`` — fresh sampling per accumulation)."""
        t = self.tcfg
        # Each host samples only its share of the global microbatch; the
        # global array is assembled in shard_batch (pod data feeding).
        mb = local_batch_size(self.cfg.batch_size)
        nD = t.num_D_steps * t.num_D_accumulations
        nG = t.num_G_accumulations
        res = self.mcfg.resolution
        slab = getattr(self, "_x_slab", None)
        if slab is None or slab.shape[:2] != (nD, mb):
            slab = np.empty((nD, mb, res, res, 3), np.float32)
            self._x_slab = slab
        labels, feats = [], []
        for i in range(nD):
            b = self.dataset.sample_batch(
                mb, weights=self.sampling_weights, images_out=slab[i]
            )
            labels.append(b.labels)
            feats.append(b.features)
        batch = {"x": slab}
        if self.mcfg.class_cond:
            batch["label"] = np.stack(labels)
        if self.mcfg.instance_cond:
            batch["feats"] = np.stack(feats)
        gl, gf = [], []
        for _ in range(nD + nG):
            labels_g, f_g = self._sample_gen_conditioning(mb)
            gl.append(labels_g)
            gf.append(f_g)
        if self.mcfg.class_cond:
            batch["gen_label"] = np.stack(gl)
        if self.mcfg.instance_cond:
            batch["gen_feats"] = np.stack(gf)
        return shard_batch(self.mesh, batch, axis=1)

    # -- eval / save --------------------------------------------------------

    def _eval_variables(self, use_ema: bool = True):
        """Eval-mode variables with spectral norm folded into the kernels
        (io.deploy) — the power-iteration graph costs more than the convs at
        small batches, and a 50k-image FID run amortizes one fold per test.
        With ``accumulate_stats`` standing statistics are accumulated first
        (``G_eval_mode``, ref utils.py:1679-1695).
        Cached per (step, use_ema)."""
        from ic_gan_tpu.io.deploy import (
            accumulate_standing_stats,
            fold_spectral_norm,
        )

        key = (int(self.state.step), use_ema)
        cache = getattr(self, "_eval_var_cache", None)
        if cache is not None and cache[0] == key:
            return cache[1]
        params = self.state.g_ema_params if use_ema else self.state.g_params
        g_state = self.state.g_ema_state if use_ema else self.state.g_state
        if self.n_proc > 1:
            # Pod eval runs on the main process only: pull the (fully
            # replicated) global arrays to host so the fold + eval jit stay
            # local instead of requiring all hosts to participate.
            params = jax.tree.map(np.asarray, params)
            g_state = jax.tree.map(np.asarray, g_state)
        variables = fold_spectral_norm({"params": params, **g_state})
        if getattr(self.cfg, "accumulate_stats", False):
            variables = accumulate_standing_stats(
                self.g, variables, jax.random.PRNGKey(self.cfg.seed),
                self.mcfg.effective_dim_z, self._sample_conditioning,
                batch_size=self.cfg.batch_size,
                n_accumulations=getattr(
                    self.cfg, "num_standing_accumulations", 16
                ),
            )
        self._eval_var_cache = (key, variables)
        return variables

    def _sample_conditioning(self, n: int):
        labels, feats = self._sample_gen_conditioning(n)
        return (
            labels if self.mcfg.class_cond else None,
            feats if self.mcfg.instance_cond else None,
        )

    def _eval_sampler(self, use_ema: bool = True):
        """Jitted fixed-shape generator forward over the folded eval
        variables — un-jitted dispatch takes minutes on the relay TPU, so
        the 50k-image FID loop must reuse one compiled executable."""
        key = (int(self.state.step), use_ema)
        cache = getattr(self, "_eval_sampler_cache", None)
        if cache is not None and cache[0] == key:
            return cache[1]
        variables = self._eval_variables(use_ema)

        @jax.jit
        def run(v, z, label, feats):
            return self.g.apply(v, z, label, feats, train=False)

        def sampler(z, label, feats):
            return run(variables, z, label, feats)

        self._eval_sampler_cache = (key, sampler)
        return sampler

    def _sv_nets(self):
        """Which nets' spectra to log: the log_*_spectra flags select; with
        only sv_log_interval set, both (upstream BigGAN train.py behavior)."""
        cfg = self.cfg
        if cfg.log_G_spectra or cfg.log_D_spectra:
            return tuple(p for p, on in (("G", cfg.log_G_spectra),
                                         ("D", cfg.log_D_spectra)) if on)
        return ("G", "D")

    def _sv_interval(self) -> int:
        cfg = self.cfg
        if cfg.sv_log_interval > 0:
            return cfg.sv_log_interval
        # Reference default interval when a spectra flag is on (utils.py:871).
        return 10 if (cfg.log_G_spectra or cfg.log_D_spectra) else 0

    def _sv_metrics(self, nets=("G", "D")) -> Dict[str, float]:
        """Per-layer singular-value estimates from the explicit ``sn``
        collections (ref ``utils.py:1590-1598`` logs G/D SVs each
        ``sv_log_interval``)."""
        out = {}
        states = {"G": self.state.g_state, "D": self.state.d_state}
        for prefix in nets:
            st = states[prefix]
            sn = st.get("sn", {}) if hasattr(st, "get") else {}
            flat = jax.tree_util.tree_flatten_with_path(sn)[0]
            for path, leaf in flat:
                name = "/".join(
                    str(getattr(p, "key", p)) for p in path
                )
                if name.endswith("sv") or "sv" in name.split("/")[-1]:
                    vals = np.asarray(leaf).ravel()
                    for i, v in enumerate(vals):
                        out[f"{prefix}_sv/{name}_{i}"] = float(v)
        return out

    def sample_fn(self, n: int, rng: jax.Array, use_ema: Optional[bool] = None):
        """Generate ``n`` images with fresh conditioning (for eval)."""
        if use_ema is None:
            use_ema = self.cfg.use_ema
        sampler = self._eval_sampler(use_ema)
        labels, feats = self._sample_conditioning(n)
        if not self.mcfg.class_cond and not self.mcfg.instance_cond:
            labels = feats = None
        z = jax.random.normal(rng, (n, self.mcfg.effective_dim_z)) * np.sqrt(
            self.tcfg.z_var
        )
        imgs = sampler(
            z,
            jnp.asarray(labels) if labels is not None else None,
            jnp.asarray(feats) if feats is not None else None,
        )
        return imgs, labels, feats

    def test(self):
        if self.eval_fn is None:
            return None
        # Multi-host: eval runs on the main process only (its state copy is
        # identical); the scalar verdicts broadcast so every host takes the
        # same early-stop / divergence decision (ref metric_main.py:59-64
        # result broadcast).
        if self.is_main:
            metrics = self.eval_fn(self)
            vals = np.asarray(
                [metrics.get("IS_mean", 0.0),
                 metrics.get("FID", float("inf"))], np.float64,
            )
        else:
            metrics = None
            vals = np.zeros(2, np.float64)
        if self.n_proc > 1:
            from jax.experimental import multihost_utils

            vals = np.asarray(multihost_utils.broadcast_one_to_all(vals))
        is_mean, fid = float(vals[0]), float(vals[1])
        if metrics is None:
            metrics = {"IS_mean": is_mean, "FID": fid}
        h = self.history
        improved = (
            (self.cfg.which_best == "IS" and is_mean > h["best_IS"])
            or (self.cfg.which_best == "FID" and fid < h["best_FID"])
        )
        if improved:
            h["epochs_no_improvement"] = 0
            if self.is_main:
                self.save(suffix=f"best{h['save_best_num']}")
            h["save_best_num"] = (h["save_best_num"] + 1) % self.cfg.num_best_copies
        else:
            h["epochs_no_improvement"] += 1
        h["best_IS"] = max(h["best_IS"], is_mean)
        h["best_FID"] = min(h["best_FID"], fid)
        if self.is_main:
            self.test_log.log(itr=h["itr"], **metrics)
            self.metric_log.log(h["itr"], **metrics)
            if self.tb:
                self.tb.add_scalars(
                    {f"Metrics/{k}": v for k, v in metrics.items()
                     if np.isscalar(v) or getattr(v, "ndim", 1) == 0},
                    h["itr"],
                )
        return metrics

    def save(self, suffix: str = ""):
        save_checkpoint(
            self.cfg.weights_root,
            self.cfg.experiment_name,
            self.state,
            config={"history": dict(self.history),
                    "best_FID": self.history["best_FID"],
                    "best_IS": self.history["best_IS"],
                    # Sampler state for exact mid-run resume — the
                    # CheckpointedSampler equivalent (ref
                    # data_utils/utils.py:125-224 replays RNG to the resume
                    # point; we snapshot the generator state directly).
                    "dataset_rng_state": self.dataset.rng.bit_generator.state},
            suffix=suffix,
        )

    def resume(self, suffix: str = ""):
        self.state, cfg = load_checkpoint(
            self.cfg.weights_root, self.cfg.experiment_name, self.state, suffix
        )
        if cfg and "history" in cfg:
            self.history.update(cfg["history"])
        if cfg and cfg.get("dataset_rng_state"):
            self.dataset.rng.bit_generator.state = cfg["dataset_rng_state"]

    def _save_progress_sheet(self, n: int = 16):
        """Fixed-seed sample grid per save — shows training evolution (ref
        ``save_and_sample`` fixed_z sheets, ``train_fns.py:245-281``)."""
        try:
            from ic_gan_tpu.cli.inference import save_image_grid

            fixed = getattr(self, "_fixed_cond", None)
            if fixed is None:
                if self.dataset.which_nn_balance == "instance_balance":
                    labels, feats = (
                        self.dataset.sample_conditioning_instance_balance(n)
                    )
                else:
                    labels, feats = (
                        self.dataset.sample_conditioning_nnclass_balance(
                            n, num_classes=self.mcfg.n_classes
                        )
                    )
                z = jax.random.normal(
                    jax.random.PRNGKey(self.cfg.seed),
                    (n, self.mcfg.effective_dim_z),
                ) * np.sqrt(self.tcfg.z_var)
                fixed = (z, labels, feats)
                self._fixed_cond = fixed
            z, labels, feats = fixed
            imgs = self.g.apply(
                self._eval_variables(use_ema=True),
                z,
                jnp.asarray(labels) if self.mcfg.class_cond else None,
                jnp.asarray(feats) if self.mcfg.instance_cond else None,
                train=False,
            )
            path = os.path.join(
                self.cfg.logs_root, self.cfg.experiment_name,
                f"fixed_samples_itr{self.history['itr']}.png",
            )
            save_image_grid(np.asarray(imgs), path, nrow=4)
        except Exception as e:  # visualization must never kill training
            print(f"progress sheet skipped ({e})")

    # -- main loop ----------------------------------------------------------

    def run(self, steps_per_epoch: Optional[int] = None):
        cfg = self.cfg
        t = self.tcfg
        per_step_imgs = cfg.batch_size * t.num_D_steps * t.num_D_accumulations
        if steps_per_epoch is None:
            steps_per_epoch = max(len(self.dataset) // per_step_imgs, 1)

        for epoch in range(self.history["epoch"], cfg.num_epochs):
            if cfg.deterministic_run:
                # Per-(epoch, rank) reseed (ref trainer.py:113-119 seeds with
                # epoch+rank so hosts draw disjoint data).
                self.dataset.rng = np.random.default_rng(
                    cfg.seed + epoch + 100003 * jax.process_index()
                )
            t0 = time.time()
            for it in range(steps_per_epoch):
                if (
                    cfg.profile_dir
                    and self.history["itr"] == cfg.profile_start
                ):
                    jax.profiler.start_trace(cfg.profile_dir)
                batch = self.make_batch()
                rng = jax.random.fold_in(
                    jax.random.PRNGKey(cfg.seed), self.history["itr"]
                )
                with jax.profiler.StepTraceAnnotation(
                    "train_step", step_num=self.history["itr"]
                ):
                    self.state, metrics = self.step_fn(self.state, batch, rng)
                self.history["itr"] += 1
                if (
                    cfg.profile_dir
                    and self.history["itr"] == cfg.profile_start + 3
                ):
                    jax.tree.map(
                        lambda x: x.block_until_ready(), self.state.g_params
                    )
                    jax.profiler.stop_trace()
                if (self.history["itr"] % max(self.cfg.log_every, 1) == 0
                        and self.is_main):
                    vals = {k: float(v) for k, v in metrics.items()}
                    self.train_log.log(itr=self.history["itr"], **vals)
                    if self.tb:
                        self.tb.add_scalars(
                            {f"Loss/{k}": v for k, v in vals.items()},
                            self.history["itr"],
                        )
                sv_int = self._sv_interval()
                if (
                    sv_int > 0
                    and self.history["itr"] % sv_int == 0
                    and self.is_main
                ):
                    self.train_log.log(
                        itr=self.history["itr"],
                        **self._sv_metrics(self._sv_nets()),
                    )
            dt = time.time() - t0
            imgs_per_sec = steps_per_epoch * per_step_imgs / dt
            if self.is_main:
                print(
                    f"epoch {epoch}: {dt:.1f}s ({imgs_per_sec:.1f} img/s) "
                    + " ".join(
                        f"{k}={float(v):.4f}" for k, v in metrics.items()
                    )
                )
            self.history["epoch"] = epoch + 1

            if (epoch + 1) % cfg.save_every == 0:
                # Checkpoint writes are rank-0-only (ref trainer.py:520-531);
                # the state is fully replicated, so main's copy is canonical.
                if self.is_main:
                    self.save()
                    if cfg.num_save_copies > 0:
                        self.save(suffix=f"copy{self.history['save_num']}")
                        self.history["save_num"] = (
                            self.history["save_num"] + 1
                        ) % cfg.num_save_copies
                    self._save_progress_sheet()
            if (epoch + 1) % cfg.test_every == 0:
                m = self.test()
                if m is not None:
                    # Divergence stop (ref trainer.py:514-516, gated on the
                    # stop_when_diverge flag like the reference).
                    if (
                        cfg.stop_when_diverge
                        and 2 * m.get("IS_mean", np.inf) < self.history["best_IS"]
                    ):
                        print("Divergence detected — stopping.")
                        return
                    # Early stop on patience (ref trainer.py:532-540).
                    if self.history["epochs_no_improvement"] >= cfg.es_patience:
                        print("Early stopping — no improvement.")
                        return
