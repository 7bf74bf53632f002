"""Training entry point (reference: ``BigGAN_PyTorch/run.py`` + ``trainer.py``).

Usage:
    python -m ic_gan_tpu.cli.train --json_config config.json [--set key=val ...]

Accepts the reference's published JSON config files (e.g.
``config_files/ImageNet/IC-GAN/icgan_res64.json``).
"""

from __future__ import annotations

from ic_gan_tpu.cli.config import parse_args, split_config


def main(argv=None):
    cfg = parse_args(argv)

    # Multi-host bootstrap (the reference's SLURM tcp:// rendezvous,
    # trainer.py:84-101): auto-detect a cluster when launched under SLURM /
    # a TPU pod, or take explicit coordinator settings from the config.
    import os

    if cfg.get("jax_distributed", False) or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    ):
        from ic_gan_tpu.parallel.mesh import distributed_init

        distributed_init(
            coordinator_address=cfg.get(
                "coordinator_address", os.environ.get("JAX_COORDINATOR_ADDRESS")
            ),
            num_processes=cfg.get("num_processes"),
            process_id=cfg.get("process_id"),
        )

    model_cfg, train_cfg, trainer_cfg, data_kwargs = split_config(cfg)

    from ic_gan_tpu.data.datasets import get_dataset_hdf5
    from ic_gan_tpu.data.distributions import make_weights_for_balanced_classes
    from ic_gan_tpu.train.trainer import Trainer

    dataset = get_dataset_hdf5(**data_kwargs)

    sampling_weights = None
    if cfg.get("longtail") and cfg.get("use_balanced_sampler"):
        labels = dataset.get_label(dataset.possible_sampling_idxs)
        sampling_weights = make_weights_for_balanced_classes(
            labels, model_cfg.n_classes,
            longtail_temperature=cfg.get("longtail_temperature", 1.0),
        )

    eval_fn = None
    if cfg.get("eval_metrics", True):
        try:
            from ic_gan_tpu.eval.pipeline import make_train_eval_fn

            eval_fn = make_train_eval_fn(cfg)
        except (ImportError, FileNotFoundError) as e:
            print(f"eval disabled ({e})")

    trainer = Trainer(
        model_cfg, train_cfg, trainer_cfg, dataset,
        eval_fn=eval_fn, sampling_weights=sampling_weights,
    )
    if cfg.get("resume", False) or cfg.get("load_weights", ""):
        trainer.resume(suffix=cfg.get("load_weights", ""))
    # steps_per_epoch caps the epoch loop (default: dataset-size derived) —
    # smoke runs and the SG2 CLI's max_steps equivalent.
    trainer.run(steps_per_epoch=cfg.get("steps_per_epoch"))


if __name__ == "__main__":
    main()
