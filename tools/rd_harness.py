"""RD evidence harness: MCTF vs OpenJPEG-intra at matched rate.

Produces ``RD_r{N}.json`` — the external quality anchor VERDICT round 3
asked for (the rebuild analogue of the reference's ``tests/RD-*.sh``
sweeps): for each test sequence and each quantization slope, the MCTF
stream is truncated (no re-encode, scal/rd.rd_curve) and decoded, and
OpenJPEG codes the SAME frames intra at the SAME byte budget
(scal/anchor.match_rate).  On temporally-redundant content the MCTF
curve must sit above the intra curve — that is the codec's reason to
exist; on the adversarial static-noise fixture ("moving": the noise
floor does not follow the motion) intra coding is expected to win, and
the artifact records that honestly.

Run:  python tools/rd_harness.py [--out RD_r04.json] [--cpu]
"""

import argparse
import json
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np


SLOPES = [44000.0, 44750.0, 45250.0, 45750.0]


def curve_for(vid, cfg, coder, slopes):
    from qsvc_tpu import api
    from qsvc_tpu.scal import rd as rdmod, anchor

    cfg = cfg.replace(texture_coder=coder)
    t0 = time.time()
    vs = api.compress(vid, cfg, reversible=False)
    enc_s = time.time() - t0
    pts = rdmod.rd_curve(vs, vid, slopes)
    raw = np.asarray(vid.y).size * 3 // 2
    out = []
    for p in pts:
        n_opj, dec_opj, ratio = anchor.match_rate(vid, p.bytes)
        out.append({
            "slope": p.quantization,
            "mctf_bytes": p.bytes,
            "mctf_bpp": round(p.bytes * 8 / raw, 5),
            "mctf_psnr_y": round(p.psnr_y, 3),
            "opj_bytes": n_opj,
            "opj_bpp": round(n_opj * 8 / raw, 5),
            "opj_psnr_y": round(anchor.psnr_y(vid, dec_opj), 3),
            "advantage_db": round(
                p.psnr_y - anchor.psnr_y(vid, dec_opj), 3),
        })
    return {"coder": coder, "encode_seconds": round(enc_s, 2),
            "points": out}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="RD_r04.json")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    import jax
    import os as _os
    from qsvc_tpu.utils import cachedir
    cachedir.configure(jax, _os.path.join(
        _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))),
        ".jax_cache"))
    from qsvc_tpu.config import CodecConfig
    from qsvc_tpu.io import synthetic_video
    from qsvc_tpu.scal import anchor

    if not anchor.available():
        print("OpenJPEG (Pillow jpg_2000) unavailable", file=sys.stderr)
        return 1

    cfg = CodecConfig(pixels_in_x=176, pixels_in_y=144, TRLs=4, GOPs=2,
                      block_size=16, search_range=4, SRLs=4,
                      quantization_texture=42000, nLayers=9,
                      update_factor=0.25)
    seqs = {
        # the codec's home turf: everything (noise included) translates
        "translate_int": synthetic_video(cfg.pictures, 144, 176, seed=5,
                                         kind="translate",
                                         velocity=(1.0, 2.0)),
        # fractional motion: needs sub-pixel ME to track
        "translate_frac": synthetic_video(cfg.pictures, 144, 176, seed=7,
                                          kind="translate",
                                          velocity=(1.5, 2.5)),
        # adversarial: static noise floor under moving content (MC cannot
        # track the noise; intra is expected to win here)
        "moving_static_noise": synthetic_video(cfg.pictures, 144, 176,
                                               seed=5, kind="moving"),
        # trivially smooth
        "gradient": synthetic_video(cfg.pictures, 144, 176, seed=5,
                                    kind="gradient"),
    }
    result = {
        "config": {
            "geometry": f"{cfg.pixels_in_x}x{cfg.pixels_in_y}",
            "TRLs": cfg.TRLs, "GOPs": cfg.GOPs, "frames": cfg.pictures,
            "SRLs": cfg.SRLs, "block_size": 16, "search_range": 4,
            "nLayers": cfg.nLayers, "encode_slope": 42000,
        },
        "anchor": "OpenJPEG (Pillow) lossy 9/7 intra, matched byte budget",
        "device": str(jax.devices()[0]),
        "sequences": {},
    }
    for name, vid in seqs.items():
        sp = (1 if name == "translate_frac" else 0)
        c = cfg.replace(subpixel_accuracy=sp)
        entry = {}
        for coder in ("bp", "mq"):
            entry[coder] = curve_for(vid, c, coder, SLOPES)
            for p in entry[coder]["points"]:
                print(f"{name:20s} {coder} slope {p['slope']:.0f} "
                      f"mctf {p['mctf_bpp']:.4f}bpp {p['mctf_psnr_y']:.2f}dB"
                      f" | opj {p['opj_bpp']:.4f}bpp "
                      f"{p['opj_psnr_y']:.2f}dB  adv "
                      f"{p['advantage_db']:+.2f}dB", flush=True)
        entry["subpixel_accuracy"] = sp
        result["sequences"][name] = entry

    # headline: mean mid-rate advantage on the temporally-redundant pair
    adv = [p["advantage_db"]
           for s in ("translate_int", "translate_frac")
           for p in result["sequences"][s]["mq"]["points"][1:3]]
    result["summary"] = {
        "mean_midrate_advantage_db_mq_translate": round(
            float(np.mean(adv)), 3),
    }
    with open(args.out, "w") as f:
        json.dump(result, f, indent=1)
    print("wrote", args.out, "summary", result["summary"])
    return 0


if __name__ == "__main__":
    sys.exit(main())
