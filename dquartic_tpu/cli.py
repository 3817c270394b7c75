"""Command-line interface.

Same surface as the reference CLI (/root/reference/dquartic/cli.py):
``train``, ``generate-config``, ``generate-train-data`` — plus
TPU-native extras: ``predict`` (batched 50-step deconvolution to parquet)
and ``convert-checkpoint`` (PyTorch -> JAX weights).
"""

from __future__ import annotations

import ast
from datetime import datetime

import click

from . import __version__


class PythonLiteralOption(click.Option):
    """Parse option values as Python literals (reference cli.py:16-23)."""

    def type_cast_value(self, ctx, value):
        if not isinstance(value, str):
            return value
        try:
            return ast.literal_eval(value)
        except Exception:
            raise click.BadParameter(value)


@click.group(chain=True)
@click.version_option(__version__)
def cli():
    """
    Diffusion Deconvolution of DIA-MS/MS Data (D^4) — TPU-native.
    """


def _device_banner():
    import jax

    click.echo("--" * 30)
    click.echo("Device Information:")
    click.echo("--" * 30)
    try:
        for d in jax.devices():
            click.echo(f"{d.platform.upper()} {d.id}: {d.device_kind}")
        click.echo(f"Default backend: {jax.default_backend()}")
    except Exception as e:
        click.echo(f"No accelerator available: {e}")
    click.echo("--" * 30)


@cli.command()
@click.argument("config-path", type=click.Path(exists=True), required=True)
@click.option("--parquet_directory", default=None, help="Directory of slice parquet files; overrides config")
@click.option("--ms2-data-path", default=None, help="Path to MS2 NPY data; overrides config")
@click.option("--ms1-data-path", default=None, help="Path to MS1 NPY data; overrides config")
@click.option("--batch-size", default=None, type=int, help="Training batch size; overrides config")
@click.option("--checkpoint-path", default=None, help="Best-model checkpoint path; overrides config")
@click.option("--use-wandb", default=None, cls=PythonLiteralOption, help="Use wandb logging; overrides config")
@click.option("--threads", default=None, type=int, help="Host data threads; overrides config")
def train(config_path, parquet_directory, ms2_data_path, ms1_data_path, batch_size, checkpoint_path, use_wandb, threads):
    """Train a DDIM model on the DIAMS dataset."""
    from .utils.builder import build_dataset, build_mesh, build_trainer
    from .utils.config import load_train_config

    _device_banner()
    click.echo(f"Info: Loading config from {config_path}")
    config = load_train_config(
        config_path,
        parquet_directory=parquet_directory,
        ms2_data_path=ms2_data_path,
        ms1_data_path=ms1_data_path,
        batch_size=batch_size,
        checkpoint_path=checkpoint_path,
        use_wandb=use_wandb,
        threads=threads,
    )

    # One mesh for both: the prefetcher commits batches directly into the
    # dp sharding the train step consumes.
    mesh = build_mesh(config, batch_size=config["model"]["batch_size"])
    dataset = build_dataset(config, mesh=mesh)
    trainer = build_trainer(config, mesh=mesh)
    m = config["model"]

    # Periodic prediction tables (reference model_interface.py:432-439):
    # every log_every_n_epochs, deconvolve one random window at several
    # step counts and log the panels.
    prediction_hook = None
    if config["tpu"].get("log_predictions") and trainer.logger is not None:
        import os

        from .infer import DDIMSampler
        from .utils.viz import PredictionLoggingHook

        prediction_hook = PredictionLoggingHook(
            DDIMSampler(trainer.model, trainer.process),
            dataset.inner.dataset,
            trainer.logger,
            out_dir=os.path.dirname(m["checkpoint_path"]) or ".",
            num_steps=config["tpu"]["prediction_num_steps"],
            backend=config["tpu"].get("plot_backend", "matplotlib"),
        )

    state = trainer.train(
        dataset,
        epochs=m["num_epochs"],
        warmup_epochs=m["warmup_epochs"],
        learning_rate=m["learning_rate"],
        checkpoint_path=m["checkpoint_path"],
        log_every_n_epochs=config["tpu"]["log_every_n_epochs"],
        checkpoint_every_n_epochs=config["tpu"]["checkpoint_every_n_epochs"],
        best_every_n_epochs=config["tpu"].get("best_every_n_epochs", 1),
        prediction_hook=prediction_hook,
    )
    if trainer.logger is not None:
        trainer.logger.finish()
    return state


@cli.command()
@click.argument("config-path", type=click.Path(), required=True)
def generate_config(config_path):
    """Generate a training configuration file."""
    from .utils.config import generate_train_config

    click.echo(f"Info: Generating config at {config_path}")
    generate_train_config(config_path)


@cli.command()
@click.argument("input-file", type=click.Path(exists=True), required=True)
@click.argument("output-file", type=click.Path(), required=True)
@click.option("--isolation_window_index", default=0, type=int, help="Index of the isolation window to extract")
@click.option("--window-size", default=34, type=int, help="Retention time window size for data slices")
@click.option("--sliding-step", default=5, type=int, help="Sliding step overlap for retention time windows slices")
@click.option("--mz-ppm-tol", default=10, type=int, help="m/z ppm tolerance for MS1 extraction")
@click.option("--bin-mz", default=True, type=bool, help="Bin m/z values to fixed dimension")
@click.option("--ms1-fixed-mz-size", default=10, type=int, help="Fixed m/z bins for MS1")
@click.option("--ms2-fixed-mz-size", default=7000, type=int, help="Fixed m/z bins for MS2")
@click.option("--batch-size", default=10, type=int, help="Window batch size")
@click.option("--batch-writing-size", default=20, type=int, help="Batches per parquet flush")
@click.option("--num-chunks", default=3, type=int, help="(compat) chunking, unused")
@click.option("--threads", default=3, type=int, help="(compat) chunk threads, unused")
def generate_train_data(
    input_file, output_file, isolation_window_index, window_size, sliding_step,
    mz_ppm_tol, bin_mz, ms1_fixed_mz_size, ms2_fixed_mz_size, batch_size,
    batch_writing_size, num_chunks, threads,
):
    """Generate training data slices from an sqMass file."""
    from .data.slices import generate_data_slices

    click.echo(
        f"[{datetime.now().strftime('%Y-%m-%d %H:%M:%S')}] Info: Generating data slices from - {input_file}"
    )
    n = generate_data_slices(
        input_file, output_file, isolation_window_index, window_size, sliding_step,
        mz_ppm_tol, bin_mz, ms1_fixed_mz_size, ms2_fixed_mz_size, batch_size,
        batch_writing_size, num_chunks, threads,
    )
    click.echo(
        f"[{datetime.now().strftime('%Y-%m-%d %H:%M:%S')}] Info: Saved {n} data slices to - {output_file}"
    )


@cli.command()
@click.argument("config-path", type=click.Path(exists=True), required=True)
@click.argument("checkpoint-path", type=click.Path(exists=True), required=True)
@click.argument("output-file", type=click.Path(), required=True)
@click.option("--num-steps", default=50, type=int, help="DDIM reverse steps")
@click.option("--num-batches", default=None, type=int, help="Limit number of batches")
@click.option("--use-ema/--no-use-ema", default=True, help="Use EMA weights when present")
@click.option(
    "--quantize-mid/--no-quantize-mid", default=None,
    help="Run the UNet1d mid-block convs with int8 weights (Pallas "
    "dequant-in-VMEM kernel) — halves the dominant weight stream. "
    "Defaults to tpu.quantize_mid from the config.",
)
@click.option(
    "--fused-resnet/--no-fused-resnet", default=None,
    help="Run the UNet1d conv stack transposed-resident with fused "
    "Pallas ResnetBlocks (removes the per-forward layout-copy cost). "
    "Defaults to tpu.fused_resnet from the config.",
)
@click.option(
    "--format", "output_format", default=None,
    type=click.Choice(["npz", "parquet"]),
    help="Output format; inferred from the output file suffix by default",
)
def predict(config_path, checkpoint_path, output_file, num_steps, num_batches, use_ema, quantize_mid, fused_resnet, output_format):
    """Deconvolute dataset windows with a trained model.

    Writes NPZ by default, or parquet (one row per prediction batch with
    flattened f32 arrays + shapes, same conventions as the training-slice
    schema) with ``--format parquet`` / a ``.parquet`` output suffix.

    Note: the CLI group is chained (reference cli.py:26 parity), so
    options must come BEFORE the positional arguments:
    ``predict --num-steps 50 CONFIG CKPT OUT``.
    """
    import numpy as np

    from .infer import DDIMSampler
    from .train.checkpoint import load_checkpoint
    from .utils.builder import (
        apply_mesh_model_flags,
        build_dataset,
        build_mesh,
        build_model,
        build_process,
    )
    from .utils.config import load_train_config

    _device_banner()
    config = load_train_config(config_path)
    model = build_model(config)
    process = build_process(config)
    ckpt = load_checkpoint(checkpoint_path)
    if ckpt is None:
        raise click.ClickException(f"Checkpoint not found: {checkpoint_path}")
    state = ckpt["state"]
    params = state.get("ema_params") if use_ema and state.get("ema_params") else state["params"]

    if quantize_mid is None:
        quantize_mid = bool(config["tpu"].get("quantize_mid"))
    if quantize_mid:
        if config["model"]["use_model"] != "UNet1d":
            raise click.ClickException("--quantize-mid only applies to UNet1d")
        from .ops.quantization import quantize_mid_block_params

        model = model.clone(quantize_mid=True)
        params = quantize_mid_block_params(params)
        click.echo("Info: int8 mid-block convolutions enabled")

    if fused_resnet is None:
        fused_resnet = bool(config["tpu"].get("fused_resnet"))
    if fused_resnet:
        if config["model"]["use_model"] != "UNet1d":
            raise click.ClickException("--fused-resnet only applies to UNet1d")
        model = model.clone(fused_resnet=True)
        click.echo("Info: fused transposed ResnetBlock path enabled")

    # Multi-chip batch deconvolution: tpu.mesh shards prediction batches
    # over dp; kernel_dp_axis / activation_sharding keep the kernels or
    # the XLA impl partitioned correctly (same rules as training).
    mesh = build_mesh(config, batch_size=config["model"]["batch_size"])
    if mesh is not None:
        model = apply_mesh_model_flags(model, mesh)
        click.echo(f"Info: sampling over mesh {dict(mesh.shape)}")
    dataset = build_dataset(config, mesh=mesh)
    sampler = DDIMSampler(model, process, mesh=mesh)
    records = []
    for i, batch in enumerate(iter(dataset)):
        if num_batches is not None and i >= num_batches:
            break
        records.extend(sampler.predict(params, [batch], num_steps=num_steps))
    if output_format is None:
        output_format = "parquet" if str(output_file).endswith(".parquet") else "npz"
    if output_format == "parquet":
        from .infer.sampler import save_predictions_parquet

        save_predictions_parquet(records, output_file)
    else:
        arrays = {}
        for i, rec in enumerate(records):
            for k, v in rec.items():
                arrays[f"{k}_{i}"] = v
        np.savez_compressed(output_file, **arrays)
    click.echo(f"Info: Saved {len(records)} prediction batches to {output_file}")


@cli.command()
@click.argument("torch-checkpoint", type=click.Path(exists=True), required=True)
@click.argument("output-file", type=click.Path(), required=True)
@click.argument("config-path", type=click.Path(exists=True), required=True)
def convert_checkpoint(torch_checkpoint, output_file, config_path):
    """Convert a reference PyTorch checkpoint to this framework's format."""
    from .compat.torch_ckpt import convert_checkpoint_file

    convert_checkpoint_file(torch_checkpoint, output_file, config_path)
    click.echo(f"Info: Converted {torch_checkpoint} -> {output_file}")


def main():
    cli()


if __name__ == "__main__":
    main()
