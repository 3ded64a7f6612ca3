"""The examples are load-bearing documentation: full_pipeline_demo.py wires
all eight subsystems end-to-end exactly the way the reference project was
used (GAN store -> GAN train -> generate -> legacy disc-transfer classifier
-> live driver -> int8 serving daemon -> plots -> Grad-CAM). Execute it so
a CLI flag change cannot rot the walkthrough silently."""

import os
import subprocess
import sys

import pytest

import conftest  # noqa: F401

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_full_pipeline_demo_runs_end_to_end(tmp_path):
    wd = str(tmp_path / "demo")
    env = dict(os.environ, PYTHONPATH=ROOT + os.pathsep
               + os.environ.get("PYTHONPATH", ""))
    proc = subprocess.run(
        [sys.executable, os.path.join(ROOT, "examples",
                                      "full_pipeline_demo.py"),
         "--workdir", wd],
        env=env, capture_output=True, text=True, timeout=1800)
    assert proc.returncode == 0, proc.stdout[-3000:] + proc.stderr[-3000:]

    # one artifact per subsystem the walkthrough promises
    run = os.path.join(wd, "runs", "run_DEMO")
    expected = [
        os.path.join(wd, "gan_store", "meta.json"),          # 2. store
        os.path.join(wd, "gan_run", "checkpoint",
                     "train_step-1.model"),                  # 3. GAN train
        os.path.join(wd, "gan_run", "sample.png"),           # 4. generate
        os.path.join(wd, "gan_run", "sample_mixing_0.png"),
        os.path.join(run, "train_step-000.model"),           # 6. live driver
        os.path.join(wd, "serve_out", "results.csv"),        # 6b. daemon
        os.path.join(wd, "gradcam_tile.png"),                # 8. Grad-CAM
    ]
    missing = [p for p in expected if not os.path.exists(p)]
    assert not missing, f"demo finished but artifacts missing: {missing}"
    # 5. legacy driver produced a run dir with a checkpoint
    legacy = os.path.join(wd, "legacy")
    assert any(f.startswith("train_step-") for _, _, fs
               in os.walk(legacy) for f in fs)
    # 6. interface mode emitted the caMicroscope manifests
    assert any(f == "manifest_img.csv" for _, _, fs in os.walk(wd)
               for f in fs)
    # 7. plots CLI rendered the metric curves
    assert any(f.endswith(".pdf") for f in os.listdir(run))
