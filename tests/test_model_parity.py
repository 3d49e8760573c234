"""Golden-model parity: our Flax ViT3D vs the reference PyTorch model.

The reference's torch model runs on CPU in this environment (SURVEY.md §4);
we load identical weights into both and assert logit/token/attention-map
closeness per config, plus loss parity for BCEWithLogits(pos_weight).
Skipped when /root/reference is unavailable.
"""

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from vit3d_ensemble_tpu.checkpoint import (  # noqa: E402
    flax_vit_to_numpy_state,
    torch_ensemble_to_flax,
    torch_vit_to_flax,
)
from vit3d_ensemble_tpu.configs import ViTConfig  # noqa: E402
from vit3d_ensemble_tpu.models import TransformerEnsemble, VisionTransformer3D  # noqa: E402
from vit3d_ensemble_tpu.models.vit3d import from_torch_layout  # noqa: E402
from vit3d_ensemble_tpu.train.losses import (  # noqa: E402
    balanced_pos_weight,
    bce_on_probs,
    bce_with_logits,
)

import jax.numpy as jnp  # noqa: E402


@pytest.fixture(scope="module")
def ref_modeling(reference_path):
    sys.path.insert(0, str(reference_path))
    try:
        import models.modeling as ref_modeling  # noqa: PLC0415
    finally:
        sys.path.pop(0)
    return ref_modeling


def _ref_torch_config(conf):
    import ml_collections

    cfg = ViTConfig.from_conf(conf)
    c = ml_collections.ConfigDict()
    c.patches = ml_collections.ConfigDict({"size": cfg.patch_size})
    c.hidden_size = cfg.hidden_size
    c.transformer = ml_collections.ConfigDict()
    c.transformer.mlp_dim = cfg.mlp_dim
    c.transformer.num_heads = cfg.num_heads
    c.transformer.num_layers = cfg.num_layers
    c.transformer.attention_dropout_rate = 0.0
    c.transformer.dropout_rate = 0.1
    c.classifier = "token"
    c.representation_size = None
    return cfg, c


def _make_pair(ref_modeling, conf, seed=0, zero_head=True):
    cfg, torch_cfg = _ref_torch_config(conf)
    torch.manual_seed(seed)
    tmodel = ref_modeling.VisionTransformer(
        torch_cfg, 128, zero_head=zero_head, num_classes=1, vis=True)
    if zero_head:
        with torch.no_grad():
            tmodel.head.weight.zero_()
            tmodel.head.bias.zero_()
    else:
        # randomize the head so parity is not trivially zero
        with torch.no_grad():
            tmodel.head.weight.normal_()
            tmodel.head.bias.normal_()
    # randomize pos-emb/cls too (they init to zeros in both frameworks)
    with torch.no_grad():
        tmodel.transformer.embeddings.position_embeddings.normal_(std=0.02)
        tmodel.transformer.embeddings.cls_token.normal_(std=0.02)
    tmodel.eval()
    params = torch_vit_to_flax(tmodel.state_dict(), cfg)
    jmodel = VisionTransformer3D(cfg, zero_head=zero_head, vis=True)
    return cfg, tmodel, jmodel, params


@pytest.mark.parametrize("conf", [1, 5, 9, 11, 18])
def test_logit_parity(ref_modeling, conf, rng):
    cfg, tmodel, jmodel, params = _make_pair(ref_modeling, conf,
                                             zero_head=False)
    x = rng.normal(size=(2, 1, 128, 128, 5)).astype(np.float32)
    with torch.no_grad():
        t_logits, t_attn, t_tokens = tmodel(torch.from_numpy(x))
    out = jmodel.apply({"params": params},
                       from_torch_layout(jnp.asarray(x)),
                       deterministic=True)
    np.testing.assert_allclose(np.asarray(out.logits),
                               t_logits.numpy(), atol=2e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(out.tokens),
                               t_tokens.numpy(), atol=2e-4, rtol=1e-4)
    # attention maps: reference returns a list of L (B, k, 65, 65) tensors
    t_attn = np.stack([a.numpy() for a in t_attn])
    np.testing.assert_allclose(np.asarray(out.attn_weights), t_attn,
                               atol=1e-5, rtol=1e-4)


def test_loss_parity_with_pos_weight(ref_modeling, rng):
    cfg, tmodel, jmodel, params = _make_pair(ref_modeling, 5, zero_head=False)
    x = rng.normal(size=(4, 1, 128, 128, 5)).astype(np.float32)
    y = np.array([0.0, 1.0, 1.0, 0.0], dtype=np.float32)

    from sklearn.utils import class_weight

    w = class_weight.compute_class_weight(
        class_weight="balanced", classes=np.unique(y), y=y)
    w = w[1] if len(w) > 1 else w[0]

    t_loss = tmodel(torch.from_numpy(x), torch.from_numpy(y),
                    torch.tensor(w))
    out = jmodel.apply({"params": params},
                       from_torch_layout(jnp.asarray(x)),
                       deterministic=True)
    pw = balanced_pos_weight(jnp.asarray(y))
    np.testing.assert_allclose(float(pw), float(w), rtol=1e-6)
    j_loss = bce_with_logits(out.logits, jnp.asarray(y), pw)
    np.testing.assert_allclose(float(j_loss), float(t_loss.detach()),
                               atol=1e-5, rtol=1e-5)


def test_balanced_pos_weight_single_class():
    # sklearn returns a single weight 1.0 when only one class is present;
    # the reference then indexes weights[0] (train_baseline_cv.py:168-169).
    assert float(balanced_pos_weight(jnp.ones(4))) == 1.0
    assert float(balanced_pos_weight(jnp.zeros(4))) == 1.0
    np.testing.assert_allclose(
        float(balanced_pos_weight(jnp.array([0.0, 1.0, 1.0, 1.0]))),
        4.0 / (2.0 * 3.0))


def test_ensemble_parity(ref_modeling, rng):
    confs = (5, 9, 11)
    cfgs = []
    tvits = []
    for i, conf in enumerate(confs):
        cfg, torch_cfg = _ref_torch_config(conf)
        torch.manual_seed(10 + i)
        tv = ref_modeling.VisionTransformer(torch_cfg, 128, zero_head=True,
                                            num_classes=1, vis=True)
        with torch.no_grad():
            tv.transformer.embeddings.position_embeddings.normal_(std=0.02)
            tv.head.weight.normal_()
        cfgs.append(cfg)
        tvits.append(tv)
    tens = ref_modeling.TransformerEnsemble(*tvits, in_features=1)
    tens.eval()

    params = torch_ensemble_to_flax(tens.state_dict(), cfgs)
    jens = TransformerEnsemble(tuple(cfgs))

    x = rng.normal(size=(3, 1, 128, 128, 5)).astype(np.float32)
    with torch.no_grad():
        t_out = tens(torch.from_numpy(x))
    j_out = jens.apply({"params": params},
                       from_torch_layout(jnp.asarray(x)),
                       deterministic=True)
    np.testing.assert_allclose(np.asarray(j_out), t_out.numpy(),
                               atol=2e-5, rtol=1e-4)

    # BCELoss-on-probs parity (train_ensemble_cv.py:63,152)
    y = np.array([1.0, 0.0, 1.0], dtype=np.float32)
    t_loss = torch.nn.BCELoss()(t_out.reshape(-1), torch.from_numpy(y))
    j_loss = bce_on_probs(j_out, jnp.asarray(y))
    np.testing.assert_allclose(float(j_loss), float(t_loss), atol=1e-6)


def test_roundtrip_export(ref_modeling, rng):
    """flax -> torch-layout export loads back into the reference model."""
    cfg, tmodel, jmodel, params = _make_pair(ref_modeling, 5, zero_head=False)
    state = flax_vit_to_numpy_state(params, cfg)
    tmodel2_cfg = _ref_torch_config(5)[1]
    tmodel2 = ref_modeling.VisionTransformer(tmodel2_cfg, 128,
                                             zero_head=False, num_classes=1)
    tmodel2.load_state_dict({k: torch.from_numpy(np.array(v))
                             for k, v in state.items()})
    tmodel2.eval()
    x = rng.normal(size=(2, 1, 128, 128, 5)).astype(np.float32)
    with torch.no_grad():
        a = tmodel(torch.from_numpy(x))[0]
        b = tmodel2(torch.from_numpy(x))[0]
    np.testing.assert_allclose(a.numpy(), b.numpy(), atol=1e-6)
