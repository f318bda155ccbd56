"""bf16-vs-f32 PSNR evidence for the 4D path (VERDICT r4 item 3).

The default-on bf16 MLP-activation deviation has medium-horizon (3000-iter)
validation only for the static config (quality_longrun.json). This repeats
the off/on pair with ``--variant owlii4d`` (ResField rank-40 lookup +
offset flow over a dynamic scene) and writes ``quality_longrun_4d.json``.

Each leg is a separate subprocess so the env knob is read at import time
exactly as production does. Run on the real TPU (~15 min incl. compiles):
    python scripts/longrun_4d_bf16.py [--iters 3000]
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import json
import subprocess

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT_PATH = os.path.join(REPO, "quality_longrun_4d.json")


def run_leg(iters, knobs):
    env = dict(os.environ, **knobs)
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "quality_gate.py"),
         "--variant", "owlii4d", "--iters", str(iters), "--no-artifact"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=7200)
    lines = [ln for ln in proc.stdout.splitlines() if ln.startswith("{")]
    if proc.returncode != 0 or not lines:
        raise SystemExit(f"leg {knobs} failed rc={proc.returncode}:\n"
                         f"{proc.stdout[-2000:]}\n{proc.stderr[-2000:]}")
    return json.loads(lines[-1])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=3000)
    args = ap.parse_args()

    legs = []
    # Both knobs pinned EXPLICITLY: an ambient SPLATFIELDS_MLP_BF16 in the
    # caller's shell must not leak into either leg, and since the auto
    # default (models/mlp.py) resolves to f32 for n_frames>0, "{}" would
    # now mean f32-vs-f32 (round-5 review finding)
    for knobs, note in (({"SPLATFIELDS_MLP_BF16": "off"}, "f32 activations"),
                        ({"SPLATFIELDS_MLP_BF16": "on"},
                         "bf16 activations (pre-round-5 default)")):
        rec = run_leg(args.iters, knobs)
        legs.append({"knobs": knobs, "note": note,
                     "psnr_db": rec["psnr_db"], "per_view": rec["per_view"],
                     "final_loss": rec["final_loss"], "iters": rec["iters"],
                     "train_s": rec["train_s"], "device": rec["device"]})
        print(json.dumps(legs[-1]), flush=True)

    delta = round(legs[1]["psnr_db"] - legs[0]["psnr_db"], 3)
    artifact = {
        "purpose": ("medium-horizon (3000-iter) bf16-vs-f32 PSNR evidence "
                    "for the 4D path (VERDICT r4 item 3): owlii4d variant — "
                    "ResField rank-40 lookup + offset flow on a dynamic "
                    "scene (quality_gate.py --variant owlii4d); pairs with "
                    "quality_longrun.json's static-config evidence"),
        "runs": legs,
        "delta_db": delta,
        "conclusion": ("bf16 non-inferior on the 4D path; default-on stands"
                       if delta >= -0.3 else
                       "bf16 REGRESSES the 4D path — flip the default to "
                       "opt-in for n_frames>0"),
    }
    with open(OUT_PATH, "w") as f:
        json.dump(artifact, f, indent=2)
    print(json.dumps({"delta_db": delta,
                      "conclusion": artifact["conclusion"]}))


if __name__ == "__main__":
    main()
