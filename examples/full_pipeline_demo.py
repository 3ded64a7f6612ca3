"""Complete-pipeline walkthrough on synthetic data — every subsystem of the
framework wired together the way the reference project used them, with no
slides, spreadsheets, or GPUs needed (CPU, a few minutes):

  1. synthetic slide tree (tile caches + cluster label sheet)
  2. resolution-keyed GAN tile store        (data.gan_dataset CLI)
  3. progressive StyleGAN WGAN-GP training  (train.gan CLI)
  4. StyleGAN sampling + style mixing       (train.gan_generate CLI)
  5. legacy GAN-discriminator classifier    (train.classify_legacy CLI,
     the reference's gbm/classify.py transfer path)
  6. live attention-MIL driver + interface  (train.classify CLI,
     the reference's gbm/classify_combined.py)
  6b. serving daemon on the int8 W8A8 path  (train.serve CLI, --once)
  7. metric plots from the run artifacts    (utils.plots CLI)
  8. Grad-CAM on a tile from the trained checkpoint (interpret kit)

    python examples/full_pipeline_demo.py --workdir /tmp/gbmnet_full
"""

import argparse
import os
import subprocess
import sys

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
PKG = "deep_convolutional_neural_network_resnet_26_and_attention_network_tpu"

from examples.synthetic_demo import build_tree  # noqa: E402

# tiny-but-real GAN geometry: width_mult shrinks every channel count;
# resolution 16 = discriminator entry step 2
WM, CODE, RES = "0.125", "32", "16"


def run_mod(module, args_list, cache):
    env = dict(os.environ, CACHE_DIR=cache,
               # CPU walkthrough on an arbitrary host: never load the
               # repo's persistent cache — XLA:CPU AOT entries compiled
               # on a different CPU can SIGILL (see utils/compcache.py)
               JAX_DISABLE_PERSISTENT_CACHE="1",
               PYTHONPATH=ROOT + os.pathsep + os.environ.get("PYTHONPATH", ""))
    print(f"\n+ python -m ...{module.split('.')[-1]} " + " ".join(args_list))
    # the demo is a CPU walkthrough: pin the CPU backend IN-PROCESS before
    # any jax use (env-var overrides can be ignored when an interpreter
    # hook pre-registers an accelerator platform, and an unreachable
    # remote device would hang every step here)
    boot = ("import jax, sys, runpy; "
            "jax.config.update('jax_platforms', 'cpu'); "
            f"sys.argv[0] = '{PKG}.{module}'; "
            f"runpy.run_module('{PKG}.{module}', run_name='__main__')")
    subprocess.run([sys.executable, "-c", boot] + args_list,
                   check=True, env=env)


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")  # CPU walkthrough (step 8
    # runs in-process; see run_mod for why the env var is not enough)
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="/tmp/gbmnet_full")
    args = ap.parse_args()
    wd = args.workdir
    cache, slides, sheet = build_tree(wd)
    data_common = ["--data_root", wd, "--image_dir", "slides",
                   "--label_sheet", sheet, "--roi_size", "32", "--f32"]

    # 2. resolution-keyed store from the tile caches (the reference's LMDB
    #    MultiResolutionDataset prepare step)
    store = os.path.join(wd, "gan_store")
    run_mod("data.gan_dataset",
            ["--src", cache, "--out", store, "--max-size", RES,
             "--max-items", "64"], cache)

    # 3. progressive StyleGAN (few steps at 4->8 px; full WGAN-GP machinery)
    gan_out = os.path.join(wd, "gan_run")
    run_mod("train.gan",
            ["--data_dir", store, "--output_dir", gan_out,
             "--epochs", "2", "--step_every", "1", "--init_size", "4",
             "--max_size", "8", "--width_mult", WM, "--code_size", CODE,
             "--batch_override", "4", "--max_batches", "2", "--phase", "8",
             "--mixing", "--seed", "0"], cache)
    gan_ckpt = os.path.join(gan_out, "checkpoint", "train_step-1.model")

    # 4. sampling + style-mixing grids from the GAN checkpoint
    run_mod("train.gan_generate",
            [gan_ckpt, "--size", "8", "--width_mult", WM,
             "--code_size", CODE, "--n_row", "2", "--n_col", "2",
             "--n_mixing", "2", "--output_dir", gan_out], cache)

    # 5. legacy driver: the GAN discriminator (truncated at --disc_cutoff)
    #    becomes the frozen tile feature extractor
    legacy_out = os.path.join(wd, "legacy")
    os.makedirs(legacy_out, exist_ok=True)
    run_mod("train.classify_legacy",
            ["--gan_ckpt", gan_ckpt, "--width_mult", WM,
             "--disc_cutoff", "2", "--resolution", RES,
             "--epoch_start", "0", "--epoch_end", "1", "--accum", "2",
             "--output_root", legacy_out] + data_common, cache)

    # 6. live driver: train 2 epochs, then caMicroscope interface mode
    runs = os.path.join(wd, "runs")
    live_common = ["--arch", "tiny", "--resolution", RES, "--accum", "2",
                   "--output_root", runs] + data_common
    run_mod("train.classify",
            ["--tag", "DEMO", "--epoch_start", "0", "--epoch_end", "2"]
            + live_common, cache)
    demo_ckpt = os.path.join(runs, "run_DEMO", "train_step-000.model")
    run_mod("train.classify", ["--interface", "--ckpt", demo_ckpt]
            + live_common, cache)

    # 6b. serving daemon: drain the slide dir once with the trained
    #     checkpoint on the int8 W8A8 path (results.csv + .dla maps;
    #     restart-idempotent via processed.txt)
    serve_out = os.path.join(wd, "serve_out")
    run_mod("train.serve",
            ["--ckpt", demo_ckpt, "--watch_dir",
             os.path.join(wd, "slides"), "--out_root", serve_out,
             "--arch", "tiny", "--resolution", RES, "--roi_size", "32",
             "--f32", "--int8", "--once", "--settle_secs", "0",
             "--chunk", "16"], cache)

    # 7. metric plots from the summary artifacts
    run_mod("utils.plots", [os.path.join(runs, "run_DEMO"),
                            "--tag", "DEMO"], cache)

    # 8. Grad-CAM on a training tile through the trained extractor
    import jax

    from deep_convolutional_neural_network_resnet_26_and_attention_network_tpu.interpret import (  # noqa: E501
        gradcam, misc,
    )
    from deep_convolutional_neural_network_resnet_26_and_attention_network_tpu.models import (  # noqa: E501
        attention_mil as amil,
    )
    from deep_convolutional_neural_network_resnet_26_and_attention_network_tpu.train import (  # noqa: E501
        checkpoint,
        classify,
    )

    # the SAME tiny config the classify CLI trained with (no duplicated
    # widths/blocks constants — restore_params is strict=False, so a
    # drifted copy would silently leave random weights)
    cfg = classify.make_config(classify.build_argparser().parse_args(
        ["--arch", "tiny"]))
    params = amil.init_attention_mil(jax.random.PRNGKey(0), cfg)
    params, loaded, skipped = checkpoint.restore_params(params, demo_ckpt)
    assert not skipped, f"checkpoint/arch mismatch: {skipped[:3]}..."
    stack = next(f for f in sorted(os.listdir(cache))
                 if f.startswith("data_"))
    tile_u8 = np.load(os.path.join(cache, stack))[0]
    cam = gradcam.gradcam(params["cnn"], misc.preprocess_image(tile_u8), 0,
                          layer="stage3")
    _, overlay = misc.apply_colormap_on_image(tile_u8, cam)
    cam_path = os.path.join(wd, "gradcam_tile.png")
    misc.save_image(overlay, cam_path)
    print(f"\nGrad-CAM -> {cam_path}  (cam range "
          f"{cam.min():.2f}..{cam.max():.2f})")

    print("\nArtifacts:")
    for root, _, files in os.walk(wd):
        for f in sorted(files):
            if f.endswith((".png", ".pdf", ".model", ".json", ".csv",
                           ".dla")):
                print("  ", os.path.relpath(os.path.join(root, f), wd))


if __name__ == "__main__":
    main()
