"""Parity for the dense-patch 3D-conv encoders (CNN1/CNN2/CNN3).

Reference ``models/Att_Encoder.py:6-99``: reachable via ``--encoder CNN1``
(``Encoder.py:19-23`` resolves over star-imported globals) though unused by
shipped configs. The reference torch modules are run in eval mode with
randomized BN running stats and compared against our flax
``CNNPatchEncoder`` with transplanted weights.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from reference_adapter import import_reference
from care_tpu.models.encoders import get_encoder


def _transplant(sd, variables):
    p = variables["params"]
    bs = variables["batch_stats"]
    for i in range(3):
        conv, bn = f"Conv_{i}", f"BatchNorm_{i}"
        w = sd[f"block{i + 1}.0.weight"]  # (out, in, kd, kh, kw)
        p[conv]["kernel"] = np.transpose(w, (2, 3, 4, 1, 0))
        p[conv]["bias"] = sd[f"block{i + 1}.0.bias"]
        p[bn]["scale"] = sd[f"block{i + 1}.1.weight"]
        p[bn]["bias"] = sd[f"block{i + 1}.1.bias"]
        bs[bn]["mean"] = sd[f"block{i + 1}.1.running_mean"]
        bs[bn]["var"] = sd[f"block{i + 1}.1.running_var"]
    p["net"]["kernel"] = sd["net.weight"].T
    p["net"]["bias"] = sd["net.bias"]
    p["LN"]["scale"] = sd["LN.weight"]
    p["LN"]["bias"] = sd["LN.bias"]
    return variables


@pytest.mark.parametrize("variant", ["CNN1", "CNN2", "CNN3"])
def test_cnn_patch_encoder_parity(variant):
    import_reference()
    import torch
    from models import Att_Encoder as ref_mod

    rng = np.random.RandomState(0)
    opt = {"dim_t": 16, "dim_hidden": 32, "n_frames": 8,
           "layer_norm_eps": 1e-12, "encoder": variant}

    ref = getattr(ref_mod, variant)(opt).eval()
    # randomize BN running stats so eval-mode parity is non-trivial
    with torch.no_grad():
        for m in ref.modules():
            if isinstance(m, torch.nn.BatchNorm3d):
                m.running_mean.copy_(torch.from_numpy(
                    rng.randn(m.num_features).astype(np.float32) * 0.1))
                m.running_var.copy_(torch.from_numpy(
                    (rng.rand(m.num_features).astype(np.float32) + 0.5)))

    x = rng.randn(2, 8, 3, 16).astype(np.float32)
    with torch.no_grad():
        ref_out = ref(torch.from_numpy(x)).numpy()

    enc = get_encoder(opt)
    variables = enc.init(jax.random.PRNGKey(0), [jnp.asarray(x)])
    variables = jax.tree_util.tree_map(np.asarray, variables)
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    variables = _transplant(sd, jax.device_get(
        jax.tree_util.tree_map(np.array, variables)))

    out = enc.apply(variables, [jnp.asarray(x)])
    ours = np.asarray(out["encoder_hidden_states"])
    assert ours.shape == ref_out.shape == (2, 1, 32)
    np.testing.assert_allclose(ours, ref_out, atol=2e-5, rtol=2e-5)
    # fused mean view matches the single-token sequence
    np.testing.assert_allclose(
        np.asarray(out["mean_encoder_hidden_states"][0]),
        ref_out[:, 0], atol=2e-5, rtol=2e-5)
