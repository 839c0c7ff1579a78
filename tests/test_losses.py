"""Attack objectives vs literal torch re-implementations of the reference
formulas (UADA.py:381-418, UPA.py:367-387) on random logits."""

import numpy as np
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from roboticattack_tpu.attacks.losses import (
    clip_grad_l1,
    gripper_asr_counts,
    tma_metrics,
    uada_loss,
    upa_loss,
)
from roboticattack_tpu.models import VLA_TINY
from roboticattack_tpu.utils import WordStubTokenizer, build_vla_example, mask_labels, pad_batch
from roboticattack_tpu.utils.constants import (
    ACTION_TOKEN_BEGIN_IDX,
    ACTION_TOKEN_MIN,
    ACTION_TOKEN_ZERO,
    IGNORE_INDEX,
    PAD_TOKEN_ID,
)

CFG = VLA_TINY
P = CFG.num_patches
V = CFG.llm.vocab_size


def _label_batch(batch=4, seed=0):
    rng = np.random.default_rng(seed)
    tok = WordStubTokenizer()
    ids_list, lab_list = [], []
    for i in range(batch):
        ids, lab = build_vla_example(f"slide the pot {i}", rng.uniform(-1, 1, 7), tok)
        ids_list.append(ids)
        lab_list.append(lab)
    labels = pad_batch(lab_list, IGNORE_INDEX)
    return labels


def _random_logits(labels, seed=1):
    # full extended-length logits (what the reference model emits); our loss
    # fns take the text-region tail full[:, P:]
    rng = np.random.default_rng(seed)
    S = labels.shape[1]
    return rng.standard_normal((labels.shape[0], P + S, V)).astype(np.float32)


def _text(logits):
    return jnp.asarray(logits[:, P:])


def _torch_uada(logits, labels, celoss, mse_weight=5.0):
    logits = torch.from_numpy(logits)
    labels = torch.from_numpy(labels.astype(np.int64))
    temp_label = labels[:, 1:]
    action_mask = temp_label > 2
    temp_logits = logits[:, :, 31744:32000]
    action_logits = temp_logits[:, -temp_label.shape[-1] - 1 : -1, :]
    action_logits = action_logits[action_mask]
    reweigh = torch.arange(1, 257) / 256
    temp_prob = F.softmax(action_logits, dim=-1)
    reweighted = (temp_prob * reweigh).sum(dim=-1)
    # literal reference semantics (UADA.py:390-396): the assignments run on
    # the ORIGINAL int64 label tensor, so 1/256 truncates to 0
    hard = temp_label[action_mask].clone()
    hard[hard > 31872] = 31999
    hard[hard <= 31872] = 31744
    hard[hard == 31999] = 1 / 256
    hard[hard == 31744] = 1
    mse = F.mse_loss(mse_weight * reweighted, mse_weight * hard.float())
    return float(mse + 1.0 / celoss), float(mse)


def _torch_upa(logits, labels, alpha=0.8, beta=0.2):
    logits = torch.from_numpy(logits)
    labels = torch.from_numpy(labels.astype(np.int64))
    temp_label = labels[:, 1:]
    action_mask = temp_label != -100
    temp_logits = logits[:, :, 31744:32000]
    action_logits = temp_logits[:, P:-1]
    reweigh = torch.arange(1, 257).float()
    temp_prob = F.softmax(action_logits, dim=-1)
    reweighted = (temp_prob * reweigh).sum(dim=-1)
    xyz_rw = torch.cat(
        [row[action_mask[i]].unsqueeze(0) for i, row in enumerate(reweighted)], dim=0
    )[:, :3]
    xyz_lab = (
        torch.cat([row[action_mask[i]].unsqueeze(0) for i, row in enumerate(temp_label)], dim=0)
        - 31743
    )[:, :3].float()
    xyz_rw = (xyz_rw - 1) / 255
    xyz_lab = (xyz_lab - 1) / 255
    cos = F.cosine_similarity(xyz_rw, xyz_lab, dim=1)
    angle = (cos + 1).mean()
    dist = 1 / (torch.norm(xyz_rw - xyz_lab, p=2, dim=1).mean() + 1e-3)
    return float(alpha * angle + beta * dist), float(angle), float(dist)


def test_uada_matches_torch_reference():
    labels = _label_batch()
    logits = _random_logits(labels)
    ce = 1.7
    for maskidx in ([0, 1, 2, 3, 4, 5, 6], [6], [0, 2]):
        masked = np.asarray(mask_labels(jnp.asarray(labels), maskidx))
        want_total, want_mse = _torch_uada(logits, masked, ce)
        got = uada_loss(_text(logits), jnp.asarray(masked), jnp.float32(ce), CFG)
        assert abs(float(got.mse_distance) - want_mse) < 1e-5
        assert abs(float(got.loss) - want_total) < 1e-5
        got_noce = uada_loss(
            _text(logits), jnp.asarray(masked), jnp.float32(ce), CFG, add_inverse_ce=False
        )
        assert abs(float(got_noce.loss) - want_mse) < 1e-5


def test_uada_mse_weight_knob():
    labels = _label_batch(seed=5)
    logits = _random_logits(labels, seed=6)
    want_total, want_mse = _torch_uada(logits, labels, 2.0, mse_weight=3.0)
    got = uada_loss(_text(logits), jnp.asarray(labels), jnp.float32(2.0), CFG, mse_weight=3.0)
    assert abs(float(got.mse_distance) - want_mse) < 1e-5


def test_upa_matches_torch_reference():
    labels = _label_batch(seed=2)
    logits = _random_logits(labels, seed=3)
    want_total, want_angle, want_dist = _torch_upa(logits, labels)
    got = upa_loss(_text(logits), jnp.asarray(labels), jnp.float32(1.0), CFG)
    assert abs(float(got.angle_loss) - want_angle) < 1e-5
    assert abs(float(got.distance_loss) - want_dist) < 2e-4
    assert abs(float(got.loss) - want_total) < 2e-4


def test_tma_metrics_perfect_prediction():
    labels = _label_batch(seed=4)
    S = labels.shape[1]
    logits = np.full((labels.shape[0], P + S, V), -10.0, dtype=np.float32)
    # plant the gt token as argmax at each predicting position
    for b in range(labels.shape[0]):
        for j in range(1, S):
            if labels[b, j] > ACTION_TOKEN_BEGIN_IDX:
                logits[b, P + j - 1, labels[b, j]] = 10.0
    m = tma_metrics(_text(logits), jnp.asarray(labels), jnp.float32(0.1), CFG)
    assert float(m.l1) == 0.0
    assert float(m.asr) == 1.0
    assert float(m.relative_distance) == 0.0


def test_gripper_asr_counts():
    preds = jnp.asarray([[ACTION_TOKEN_ZERO, ACTION_TOKEN_MIN, ACTION_TOKEN_ZERO]])
    gt = jnp.asarray([[ACTION_TOKEN_ZERO, ACTION_TOKEN_ZERO, ACTION_TOKEN_MIN]])
    mask = jnp.asarray([[True, True, True]])
    c = gripper_asr_counts(preds, gt, mask)
    assert int(c["zero_total"]) == 2 and int(c["zero_flipped"]) == 1
    assert int(c["one_total"]) == 1 and int(c["one_flipped"]) == 1
    assert int(c["other_total"]) == 0


def test_clip_grad_l1_matches_torch():
    g = np.random.default_rng(0).standard_normal((3, 5, 5)).astype(np.float32)
    t = torch.from_numpy(g.copy())
    t.grad = None
    p = torch.nn.Parameter(t)
    p.grad = torch.from_numpy(g.copy())
    torch.nn.utils.clip_grad_norm_([p], max_norm=1e-3, norm_type=1)
    ours = np.asarray(clip_grad_l1(jnp.asarray(g), 1e-3))
    np.testing.assert_allclose(ours, p.grad.numpy(), rtol=1e-5, atol=1e-8)


def _force_xyz_tokens(labels, token):
    """Set each row's first three action-token labels to `token`."""
    out = labels.copy()
    for b in range(out.shape[0]):
        pos = np.where(out[b] > ACTION_TOKEN_BEGIN_IDX)[0][:3]
        out[b, pos] = token
    return out


def test_upa_degenerate_zero_gt_matches_torch():
    """Zero gt xyz vectors (all three tokens at the +1 bin -> mapped 0.0):
    F.cosine_similarity clamps EACH norm to eps separately, so the cosine is
    ~0 rather than exploding — the clamp semantics the repo must match
    (UPA.py:382, randomized sweep incl. the degenerate rows)."""
    labels = _force_xyz_tokens(_label_batch(seed=7), ACTION_TOKEN_MIN)
    logits = _random_logits(labels, seed=8)
    want_total, want_angle, want_dist = _torch_upa(logits, labels)
    got = upa_loss(_text(logits), jnp.asarray(labels), jnp.float32(1.0), CFG)
    assert abs(float(got.angle_loss) - want_angle) < 1e-5
    assert abs(float(got.distance_loss) - want_dist) < 2e-4
    assert np.isfinite(float(got.loss))


def test_upa_randomized_torch_sweep():
    """Randomized parity sweep: per-seed random logits/labels with a mix of
    ordinary, zero-gt, and near-zero-gt xyz rows."""
    for seed in range(4):
        labels = _label_batch(batch=3, seed=20 + seed)
        if seed % 2:
            labels = _force_xyz_tokens(labels, ACTION_TOKEN_MIN)
        logits = _random_logits(labels, seed=40 + seed)
        want_total, want_angle, want_dist = _torch_upa(logits, labels)
        got = upa_loss(_text(logits), jnp.asarray(labels), jnp.float32(1.0), CFG)
        assert abs(float(got.angle_loss) - want_angle) < 1e-5, seed
        assert abs(float(got.distance_loss) - want_dist) < 2e-4, seed


def test_upa_per_example_angle_matches_torch_on_degenerate_rows():
    """The per-example val 'angle' metric must share the train loss's per-norm
    clamp semantics (F.cosine_similarity): on zero / near-zero gt xyz rows the
    two sites previously diverged (product-clamped denominator). Sweep
    ordinary, zero-gt, and tiny-gt rows vs torch's per-row cosine."""
    from roboticattack_tpu.attacks.losses import per_example_metrics

    for seed, tok in ((11, None), (12, ACTION_TOKEN_MIN), (13, ACTION_TOKEN_MIN + 1)):
        labels = _label_batch(batch=3, seed=seed)
        if tok is not None:
            labels = _force_xyz_tokens(labels, tok)
        logits = _random_logits(labels, seed=seed + 100)

        t_logits = torch.from_numpy(logits)
        t_labels = torch.from_numpy(labels.astype(np.int64))
        temp_label = t_labels[:, 1:]
        action_mask = temp_label != -100
        action_logits = t_logits[:, :, 31744:32000][:, P:-1]
        reweighted = (F.softmax(action_logits, dim=-1) * torch.arange(1, 257).float()).sum(-1)
        xyz_rw = torch.cat(
            [row[action_mask[i]].unsqueeze(0) for i, row in enumerate(reweighted)], dim=0
        )[:, :3]
        xyz_lab = (
            torch.cat(
                [row[action_mask[i]].unsqueeze(0) for i, row in enumerate(temp_label)], dim=0
            )
            - 31743
        )[:, :3].float()
        want = (F.cosine_similarity((xyz_rw - 1) / 255, (xyz_lab - 1) / 255, dim=1) + 1).numpy()

        got = per_example_metrics(_text(logits), jnp.asarray(labels), CFG, "upa")["angle"]
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-6)
        # and the two sites agree with each other: mean of per-example angles
        # == the train angle_loss on the same batch
        train = upa_loss(_text(logits), jnp.asarray(labels), jnp.float32(1.0), CFG)
        assert abs(float(train.angle_loss) - float(np.mean(np.asarray(got)))) < 1e-5


def test_uada_fully_masked_rows_stay_finite():
    """maskidx=[] turns every action label IGNORE. The reference's boolean
    `.view(-1, 7)` machinery would crash on this input; the static-shape
    masked reductions here must simply produce finite values."""
    labels = np.asarray(mask_labels(jnp.asarray(_label_batch(seed=9)), []))
    logits = _random_logits(labels, seed=10)
    got = uada_loss(_text(logits), jnp.asarray(labels), jnp.float32(1.3), CFG)
    assert np.isfinite(float(got.loss))
    assert np.isfinite(float(got.mse_distance)) and np.isfinite(float(got.uad))
