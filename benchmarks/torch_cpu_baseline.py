"""Measure the PyTorch reference's train-step throughput on CPU.

Runs the ACTUAL reference implementation (imported read-only from
/root/reference with stubs for its missing deps) through one iteration of
its hot loop — generator forward, discriminator forward on detached fake +
real, D backward + AdamW step, discriminator forward on fake + real, full
generator loss (adv + 15x multi-TD + SU + phoneme + 7x feature matching),
G backward + AdamW step (reference: ste_gan/train.py:165-268) — and records
EMG channel-samples/sec to ``benchmarks/torch_cpu_baseline.json``.

This is the "PyTorch-CPU train-step throughput" denominator of the
BASELINE.md >=10x target. Nothing here is part of the framework.

Usage: python benchmarks/torch_cpu_baseline.py [--steps 3] [--batch 32]
"""
from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent / "tests"))

import numpy as np
import torch
import torch.nn.functional as F

from ref_loader import import_reference


def measure(batch_size: int, chunk: int, steps: int, warmup: int = 1) -> dict:
    ref_gen = import_reference("ste_gan.models.generator")
    ref_disc = import_reference("ste_gan.models.discriminator")
    ref_enc = import_reference("ste_gan.models.emg_encoder")
    ref_td = import_reference("ste_gan.losses.time_domain_loss")
    ref_enc_loss = import_reference("ste_gan.losses.emg_encoder_loss")

    torch.manual_seed(0)
    netG = ref_gen.EMGGeneratorGanTTS(
        speech_feature_type="SPEECH_UNITS", speech_input_dim=256,
        num_sessions=17, num_emg_channels=8)
    netD = ref_disc.DiscriminatorSmall(num_emg_channels=8)
    encoder = ref_enc.EMGEncoderTransformer(num_ins=8, num_outs=256,
                                            num_aux_outs=48)
    for layer in encoder.transformer.layers:  # torch>=2.1 fast-path sniffing
        layer.self_attn.batch_first = False
        layer.norm_first = False
    encoder.eval()
    multi_td = ref_td.MultiTimeDomainFeatureLoss(8)
    enc_loss = ref_enc_loss.EMGEncoderLoss(encoder)

    optG = torch.optim.AdamW(netG.parameters(), lr=2e-4, betas=(.8, .99))
    optD = torch.optim.AdamW(netD.parameters(), lr=2e-4, betas=(.8, .99))

    frames = chunk // 16
    x_t = torch.tanh(torch.randn(batch_size, chunk, 8) * 0.4)
    s_t = torch.randn(batch_size, frames, 256)
    sess = torch.randint(0, 17, (batch_size,))
    mode = torch.zeros(batch_size, dtype=torch.long)
    phonemes = torch.randint(0, 48, (batch_size, frames))

    def one_step():
        netD.zero_grad()
        netG.zero_grad()
        x_pred = netG(s_t, sess, mode)
        # D step
        d_fake = netD(x_pred.detach())
        d_real = netD(x_t)
        loss_d = sum(F.mse_loss(s[-1], torch.zeros_like(s[-1])) for s in d_fake)
        loss_d = loss_d + sum(F.mse_loss(s[-1], torch.ones_like(s[-1]))
                              for s in d_real)
        loss_d.backward()
        optD.step()
        # G step
        d_fake = netD(x_pred)
        d_real = netD(x_t)
        loss_g = sum(F.mse_loss(s[-1], torch.ones_like(s[-1])) for s in d_fake)
        loss_g = loss_g + 15.0 * multi_td(x_t, x_pred)
        out = enc_loss(x_pred, s_t, phonemes)
        loss_g = loss_g + 1.0 * out.speech_unit_loss + 1.0 * out.phoneme_loss
        fm = sum(F.l1_loss(d_fake[i][j], d_real[i][j].detach())
                 for i in range(len(d_fake)) for j in range(len(d_fake[i]) - 1))
        loss_g = loss_g + 7.0 * fm
        loss_g.backward()
        optG.step()
        return float(loss_g)

    for _ in range(warmup):
        one_step()
    per_step = []
    for _ in range(steps):
        start = time.perf_counter()
        one_step()
        per_step.append(time.perf_counter() - start)
    elapsed = float(np.mean(per_step))

    ch_samples = batch_size * chunk * 8
    return {
        "impl": "pytorch-reference-cpu",
        "batch_size": batch_size,
        "chunk_size": chunk,
        "steps_timed": steps,
        "warmup_steps": warmup,
        "sec_per_step": elapsed,
        "sec_per_step_std": float(np.std(per_step)),
        "sec_per_step_all": [round(t, 3) for t in per_step],
        "emg_channel_samples_per_sec": ch_samples / elapsed,
        "torch_version": torch.__version__,
        "cpu_count": __import__("os").cpu_count(),
    }


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--steps", type=int, default=5)
    parser.add_argument("--batch", type=int, default=32)
    parser.add_argument("--chunk", type=int, default=2048)
    args = parser.parse_args()
    result = measure(args.batch, args.chunk, args.steps)
    out = Path(__file__).parent / "torch_cpu_baseline.json"
    out.write_text(json.dumps(result, indent=2))
    print(json.dumps(result, indent=2))
