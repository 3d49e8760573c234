"""End-to-end CLI driver tests on a synthetic dataset (CPU, tiny settings).

Each reference-mirroring driver runs in-process via main(argv): data loading
from PNG folders, training, checkpointing, reports — the full path minus
scale.  img_size=32 keeps CPU runtime sane (4 patches + CLS = 5 tokens).
"""

import json
import os
import zipfile

import numpy as np
import pandas as pd
import pytest


@pytest.fixture(scope="module")
def synth_root(tmp_path_factory):
    """8 patients x 4 aug folders x 12 PNG slices + all split CSVs
    (single source of truth: __graft_entry__._synth_dataset)."""
    from __graft_entry__ import _synth_dataset

    root = tmp_path_factory.mktemp("cli_data")
    _synth_dataset(str(root), img=32, num_cv=2, fixed_split=True)
    return root


def _common(synth_root, out, csv_sub):
    return [
        "--csv_path", str(synth_root / "csv_files" / csv_sub),
        "--data_root", str(synth_root / "dataset"),
        "--output_dir", str(out),
        "--img_size", "32",
    ]


def test_cli_baseline_whole_dataset(synth_root, tmp_path):
    from vit3d_ensemble_tpu.cli import train_baseline_whole_dataset as d

    out = tmp_path / "out"
    res = d.main([
        "--config", "9", "--num_steps", "4", "--eval_every", "2",
        "--warmup_steps", "2",
        *_common(synth_root, out, "fixed_split"),
    ])
    assert 9 in res and "AUROC" in res[9]
    assert (out / "baseline_models" / "conf9" / "conf9.msgpack").exists()


def test_cli_baseline_whole_dataset_all_configs(synth_root, tmp_path):
    from vit3d_ensemble_tpu.cli import train_baseline_whole_dataset as d

    out = tmp_path / "out"
    res = d.main([
        "--all_configs", "--num_steps", "2", "--eval_every", "2",
        "--warmup_steps", "1",
        *_common(synth_root, out, "fixed_split"),
    ])
    assert set(res) == set(range(1, 19))
    for c in (1, 9, 18):
        assert (out / "baseline_models" / f"conf{c}" /
                f"conf{c}.msgpack").exists()


def test_cli_baseline_cv_single(synth_root, tmp_path):
    from vit3d_ensemble_tpu.cli import train_baseline_cv as d

    out = tmp_path / "out"
    res = d.main([
        "--config", "9", "--num_cv", "2", "--num_steps", "4",
        "--eval_every", "2", "--warmup_steps", "2",
        *_common(synth_root, out, "cross_validation"),
    ])
    assert set(res) == {"CV 1", "CV 2"}
    assert (out / "cv_baseline_models" / "conf9" / "cv2.msgpack").exists()

    # --aug_mode device through the POOLED sweep engine (--all_configs):
    # same policy computed on device at pool-build time, no disk aug
    # folders read
    res_dev = d.main([
        "--all_configs", "--num_cv", "2", "--num_steps", "2",
        "--eval_every", "2", "--warmup_steps", "1",
        "--aug_mode", "device",
        *_common(synth_root, tmp_path / "out_dev", "cross_validation"),
    ])
    assert set(res_dev) == set(range(1, 19))
    assert all(np.isfinite(m["AUROC"])
               for folds in res_dev.values() for m in folds.values())


def test_cli_baseline_bootstrap(synth_root, tmp_path):
    from vit3d_ensemble_tpu.cli import train_baseline_bootstrap as d

    out = tmp_path / "out"
    res = d.main([
        "--config", "9", "--num_rep", "2", "--num_steps", "4",
        "--eval_every", "2", "--warmup_steps", "2",
        *_common(synth_root, out, "fixed_split"),
    ])
    assert "conf9" in res and "boot1" in res["conf9"]
    assert (out / "boot_baseline_models" / "conf9" / "boot1.msgpack").exists()
    assert (out / "Baseline_Bootstrap.csv").exists()


def test_cli_baseline_bootstrap_chunk_invariant(synth_root, tmp_path):
    """--boot_chunk exists so num_rep=100 fits HBM (25 reps/program
    measured 20.77G vs the 15.75G budget); results must not depend on it.
    Per-cell dropout keys are derived from the GLOBAL replicate grid
    (engine.run_group fold_ids/n_folds_total), so chunked == one-shot."""
    from vit3d_ensemble_tpu.cli import train_baseline_bootstrap as d

    common = [
        "--config", "9", "--num_rep", "2", "--num_steps", "4",
        "--eval_every", "2", "--warmup_steps", "2",
        "--csv_path", str(synth_root / "csv_files" / "fixed_split"),
        "--data_root", str(synth_root / "dataset"),
        "--img_size", "32",
    ]
    r1 = d.main(common + ["--boot_chunk", "1",
                          "--output_dir", str(tmp_path / "c1")])
    r2 = d.main(common + ["--boot_chunk", "2",
                          "--output_dir", str(tmp_path / "c2")])
    assert set(r1["conf9"]) == {"boot0", "boot1"}
    for b, m in r1["conf9"].items():
        for k, v in m.items():
            assert abs(v - r2["conf9"][b][k]) < 1e-6, (b, k)


def test_cli_ensemble_pipeline(synth_root, tmp_path):
    """whole-dataset baselines -> frozen ensemble CV -> test_cv, end to end."""
    from vit3d_ensemble_tpu.cli import (
        test_cv as tcv,
        train_baseline_cv as basecv_d,
        train_baseline_whole_dataset as base_d,
        train_ensemble_cv as ens_d,
        train_ensemble_whole_dataset as ensw_d,
    )

    out = tmp_path / "out"
    for c in (1, 2, 3):
        base_d.main([
            "--config", str(c), "--num_steps", "2", "--eval_every", "2",
            "--warmup_steps", "1",
            *_common(synth_root, out, "fixed_split"),
        ])
    basecv_d.main([
        "--config", "1", "--num_cv", "2", "--num_steps", "2",
        "--eval_every", "2", "--warmup_steps", "1",
        *_common(synth_root, out, "cross_validation"),
    ])

    # frozen 816-style sweep restricted to C(3,3)=1 combination
    res = ens_d.main([
        "--frozen",
        "--max_configs", "4", "--num_epochs", "2", "--num_cv", "2",
        *_common(synth_root, out, "cross_validation"),
    ])
    assert "1_2_3" in res and "CV 2" in res["1_2_3"]
    assert (out / "Ensemble_CV.csv").exists()
    with zipfile.ZipFile(out / "Ensemble_CV.xlsx") as z:
        assert "xl/worksheets/sheet1.xml" in z.namelist()

    # reference-faithful end-to-end CV mode (backbones fine-tuned)
    res_e2e = ens_d.main([
        "--max_configs", "4", "--num_epochs", "2", "--num_cv", "1",
        "--end_to_end", "--save_ensembles", "--workbook",
        "Ensemble_CV_e2e",
        *_common(synth_root, out, "cross_validation"),
    ])
    assert "1_2_3" in res_e2e and "CV 1" in res_e2e["1_2_3"]
    assert (out / "cv_ensemble_models" / "ensemble_1_2_3" /
            "cv1.msgpack").exists()

    # e2e sweep resume: completed combos reload from markers (no retrain)
    res_resumed = ens_d.main([
        "--max_configs", "4", "--num_epochs", "2", "--num_cv", "1",
        "--end_to_end", "--resume", "--save_ensembles", "--workbook",
        "Ensemble_CV_e2e",
        *_common(synth_root, out, "cross_validation"),
    ])
    assert res_resumed == res_e2e

    # --state_mirror: resume survives total loss of the marker directory
    # (the container-reset scenario) by rehydrating from the in-repo
    # mirror — no retraining happens (num_epochs would otherwise matter)
    mirror_path = tmp_path / "mirror" / "e2e.jsonl"
    ens_d.main([
        "--max_configs", "4", "--num_epochs", "2", "--num_cv", "1",
        "--end_to_end", "--resume", "--state_mirror", str(mirror_path),
        "--workbook", "Ensemble_CV_e2e",
        *_common(synth_root, out, "cross_validation"),
    ])
    assert mirror_path.exists()          # snapshot taken via append/restore
    import shutil as _sh

    _sh.rmtree(out / "sweep_state")
    res_mirrored = ens_d.main([
        "--max_configs", "4", "--num_epochs", "2", "--num_cv", "1",
        "--end_to_end", "--resume", "--state_mirror", str(mirror_path),
        "--workbook", "Ensemble_CV_e2e",
        *_common(synth_root, out, "cross_validation"),
    ])
    assert res_mirrored == res_e2e

    # the grid also evaluated each combo on the held-out test split (probs
    # ride the selection payload) and persisted the metrics in the marker
    assert (out / "Ensemble_CV_e2e_test.csv").exists()
    markers = list((out / "sweep_state").glob("e2e_1_2_3_*.json"))
    assert markers, "e2e resume marker missing"
    blob = json.loads(markers[0].read_text())
    assert blob["combo"] == [1, 2, 3]
    assert np.isfinite(blob["test"]["CV 1"]["AUROC"])
    assert "val" in blob and "CV 1" in blob["val"]

    # test_cv --all_ensembles ranks e2e-trained combos from those markers
    # (no per-combo checkpoints needed)
    res_all, ranking_all = tcv.test_all_ensembles(
        tcv.build_parser().parse_args([
            "--all_ensembles", "--max_configs", "4", "--cv", "1",
            *_common(synth_root, out, "cross_validation"),
        ]))
    assert ranking_all[0][0] == "1_2_3"
    assert res_all["1_2_3"]["CV 1"] == blob["test"]["CV 1"]

    # legacy (val-only) markers from a pre-test-metrics sweep get re-queued
    # and upgraded in place on --resume (--backfill_test, the default)
    markers[0].write_text(json.dumps(blob["val"]))
    res_back = ens_d.main([
        "--max_configs", "4", "--num_epochs", "2", "--num_cv", "1",
        "--end_to_end", "--resume", "--save_ensembles", "--workbook",
        "Ensemble_CV_e2e",
        *_common(synth_root, out, "cross_validation"),
    ])
    assert res_back == res_e2e          # deterministic retrain, same val
    blob2 = json.loads(markers[0].read_text())
    assert blob2["test"]["CV 1"] == blob["test"]["CV 1"]

    # padded-template e2e: shared compiled program per class-multiset,
    # checkpoints cropped back to true-config shapes
    out_pad = tmp_path / "out_pad"
    for c in (1, 2, 3):
        import shutil

        src = out / "baseline_models" / f"conf{c}"
        shutil.copytree(src, out_pad / "baseline_models" / f"conf{c}")
    res_pad = ens_d.main([
        "--max_configs", "4", "--num_epochs", "2", "--num_cv", "1",
        "--end_to_end", "--padded_compile", "--save_ensembles",
        "--workbook", "Ensemble_pad",
        *_common(synth_root, out_pad, "cross_validation"),
    ])
    assert "1_2_3" in res_pad and "CV 1" in res_pad["1_2_3"]
    from vit3d_ensemble_tpu.checkpoint import restore_pytree as _rp
    from vit3d_ensemble_tpu.configs import ViTConfig as _VC
    from vit3d_ensemble_tpu.train.ensemble_trainer import init_ensemble

    cfgs = [_VC.from_conf(c, img_size=32) for c in (1, 2, 3)]
    _, target = init_ensemble(cfgs, [], seed=0)
    import jax as _jax

    ck = _rp(str(out_pad / "cv_ensemble_models" / "ensemble_1_2_3" /
                 "cv1.msgpack"), _jax.device_get(target))
    fc1 = ck["transformer_0"]["encoder"]["layers"]["block"]["ffn"]["fc1"][
        "kernel"]
    assert fc1.shape == (cfgs[0].num_layers, cfgs[0].hidden_size,
                         cfgs[0].mlp_dim)      # true shape, not template

    # end-to-end ensemble retrain on the fixed split
    m = ensw_d.main([
        "--ensemble_conf_list", "1,2,3", "--num_epochs", "2",
        *_common(synth_root, out, "fixed_split"),
    ])
    assert "AUROC" in m
    assert (out / "best_ensemble_models" / "ensemble_1_2_3" /
            "best_ensemble_model.msgpack").exists()

    # test driver: baseline + ensemble (frozen meta heads) + statistics
    res_base, res_ens, stats = tcv.main([
        "--baseline", "--ensemble", "--conf", "1",
        "--ensemble_conf_list", "1,2,3", "--cv", "2",
        *_common(synth_root, out, "cross_validation"),
    ])
    assert res_base is not None and "CV 2" in res_base
    assert res_ens is not None and "CV 1" in res_ens
    assert "mann_whitney" in stats

    # all-combination test evaluation: every trained meta head, vmapped,
    # ranking workbook written (reference test_cv.py:109-189 intent)
    res_base2, res_all_best, _ = tcv.main([
        "--baseline", "--all_ensembles", "--conf", "1",
        "--max_configs", "4", "--cv", "2",
        *_common(synth_root, out, "cross_validation"),
    ])
    assert res_all_best is not None and "CV 2" in res_all_best
    assert "AUROC" in res_all_best["CV 1"]
    assert (out / "Test_All_Ensembles.csv").exists()
    with zipfile.ZipFile(out / "Test_All_Ensembles.xlsx") as z:
        assert "xl/worksheets/sheet1.xml" in z.namelist()

    # OOD noise mode (create_dataset.py:55-59): must run end to end and
    # actually perturb the inputs (different probs than the clean run)
    _, res_ood, _ = tcv.main([
        "--ensemble", "--ensemble_conf_list", "1,2,3", "--cv", "2",
        "--ood", "--ood_var", "100.0",
        *_common(synth_root, out, "cross_validation"),
    ])
    assert res_ood is not None and "CV 1" in res_ood
    clean = [res_ens[f]["BS"] for f in res_ens]
    noisy = [res_ood[f]["BS"] for f in res_ood]
    assert clean != noisy


def test_cli_ensemble_bootstrap(synth_root, tmp_path):
    from vit3d_ensemble_tpu.cli import (
        train_baseline_whole_dataset as base_d,
        train_ensemble_bootstrap as d,
    )

    out = tmp_path / "out"
    for c in (1, 2, 3):
        base_d.main([
            "--config", str(c), "--num_steps", "2", "--eval_every", "2",
            "--warmup_steps", "1",
            *_common(synth_root, out, "fixed_split"),
        ])
    val_res, test_res = d.main([
        "--frozen",
        "--max_configs", "4", "--num_rep", "2", "--num_epochs", "2",
        *_common(synth_root, out, "fixed_split"),
    ])
    assert "1_2_3" in val_res and "boot1" in val_res["1_2_3"]
    assert "1_2_3" in test_res
    assert (out / "Ensemble_Bootstrap_test.csv").exists()

    # end-to-end grid mode: held-out test metrics ride the selection
    # payload; checkpoints written only with --save_ensembles
    val_e2e, test_e2e = d.main([
        "--max_configs", "4", "--num_rep", "2", "--num_epochs", "2",
        "--save_ensembles", "--workbook", "Ensemble_Boot_e2e",
        *_common(synth_root, out, "fixed_split"),
    ])
    assert "1_2_3" in val_e2e and "boot1" in test_e2e["1_2_3"]
    m = test_e2e["1_2_3"]["boot0"]
    assert np.isfinite([m["AUROC"], m["BS"]]).all()
    assert (out / "bootstrap_ensemble_models" / "ensemble_1_2_3" /
            "bootstrap_1.msgpack").exists()
    assert (out / "Ensemble_Boot_e2e_test.csv").exists()

    # resume: marker-complete combos reload without retraining
    val_r, test_r = d.main([
        "--max_configs", "4", "--num_rep", "2", "--num_epochs", "2",
        "--save_ensembles", "--resume", "--workbook", "Ensemble_Boot_e2e",
        *_common(synth_root, out, "fixed_split"),
    ])
    assert val_r == val_e2e and test_r == test_e2e

    # --state_mirror resume survives marker-dir loss (boot_* markers ride
    # the same mirror mechanism as the CV grid's e2e_* markers)
    mirror_path = tmp_path / "mirror_boot.jsonl"
    d.main([
        "--max_configs", "4", "--num_rep", "2", "--num_epochs", "2",
        "--resume", "--state_mirror", str(mirror_path),
        "--workbook", "Ensemble_Boot_e2e",
        *_common(synth_root, out, "fixed_split"),
    ])
    import shutil as _sh

    _sh.rmtree(out / "sweep_state")
    val_m, test_m = d.main([
        "--max_configs", "4", "--num_rep", "2", "--num_epochs", "2",
        "--resume", "--state_mirror", str(mirror_path),
        "--workbook", "Ensemble_Boot_e2e",
        *_common(synth_root, out, "fixed_split"),
    ])
    assert val_m == val_e2e and test_m == test_e2e


def test_reference_cli_flag_parity():
    """Every flag the reference scripts declare parses on our drivers —
    including upstream's alternate spellings and dead flags (--device,
    --image_size, --max_grad_norm, --num_cv on the fixed-split ensemble,
    test_cv's --base_path/--ens_path)."""
    from vit3d_ensemble_tpu.cli import (
        test_cv as tcv,
        train_baseline_whole_dataset as bw,
        train_ensemble_cv as ecv,
        train_ensemble_whole_dataset as ew,
    )

    a = ecv.build_parser().parse_args(
        ["--image_size", "96", "--device", "cuda:0"])
    assert a.img_size == 96               # --image_size aliases --img_size
    assert bw.build_parser().parse_args(
        ["--max_grad_norm", "2.0"]).max_grad_norm == 2.0
    assert ew.build_parser().parse_args(["--num_cv", "5"]).num_cv == 5
    a = tcv.build_parser().parse_args(
        ["--base_path", "/x/cv_baseline_models",
         "--ens_path", "/y/cv_ensemble_models"])
    assert tcv._cv_baseline_ckpt(a, 5, "cv1") == \
        "/x/cv_baseline_models/conf5/cv1.msgpack"
    assert tcv._cv_ensemble_ckpt(a, "5_9_11", "cv2") == \
        "/y/cv_ensemble_models/ensemble_5_9_11/cv2.msgpack"


def test_cli_single_combination_cv_and_marker_fallback(synth_root, tmp_path):
    """Round-5 additions: (a) `train_ensemble_cv --ensemble_conf_list`
    restricts the CV sweep to ONE combination (the whole-dataset driver's
    flag honored for single-combination retrains, e.g. to produce the
    per-fold checkpoints test_cv --ood consumes); (b) `test_cv --ensemble`
    falls back to the e2e sweep's resume markers when no checkpoint
    exists (the default 816x5 grid keeps metrics, not ~4080 ckpts)."""
    from vit3d_ensemble_tpu.cli import (
        test_cv as tcv,
        train_ensemble_cv as ens_d,
    )

    out = tmp_path / "out"
    res = ens_d.main([
        "--ensemble_conf_list", "1,3,2", "--num_epochs", "2",
        "--num_cv", "2", "--random_init_members", "--save_ensembles",
        *_common(synth_root, out, "cross_validation"),
    ])
    # exactly the requested combination, nothing else
    assert set(res) == {"1_3_2"} and "CV 2" in res["1_3_2"]
    assert (out / "cv_ensemble_models" / "ensemble_1_3_2" /
            "cv2.msgpack").exists()

    # (b) markers exist (written by the sweep above), checkpoints don't:
    # delete them and confirm test_cv --ensemble reads the marker metrics
    import shutil

    shutil.rmtree(out / "cv_ensemble_models")
    _, res_ens, _ = tcv.main([
        "--ensemble", "--ensemble_conf_list", "1,3,2", "--cv", "2",
        *_common(synth_root, out, "cross_validation"),
    ])
    assert res_ens is not None and set(res_ens) == {"CV 1", "CV 2"}
    assert "AUROC" in res_ens["CV 1"]


def test_quant_impl_flag_plumbing():
    """--quant_impl reaches the process-wide selector via
    apply_runtime_flags (and resets to 'none' for the next test)."""
    from vit3d_ensemble_tpu.cli._common import apply_runtime_flags
    from vit3d_ensemble_tpu.cli.test_cv import build_parser
    from vit3d_ensemble_tpu.ops.quant import get_default_quant_impl

    args = build_parser().parse_args(["--quant_impl", "int8_attn"])
    apply_runtime_flags(args)
    assert get_default_quant_impl() == "int8_attn"
    apply_runtime_flags(build_parser().parse_args([]))
    assert get_default_quant_impl() == "none"
