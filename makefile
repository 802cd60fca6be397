# Canned experiment recipes (the de-facto workload documentation, like the
# reference's makefile). All *-synth targets run on the built-in procedural
# dataset and need no downloads; dataset targets expect data under data/.

PY ?= python

# ---- no-download smoke/golden experiments --------------------------------

synth-tiny:
	$(PY) runner.py -d "" --data-kind synthetic --model tiny --size 64 \
	  --num-views 8 --epochs 2000 --batch-size 2048 --steps 32 \
	  --near 1.5 --far 4.5 -lr 1e-3 --outdir outputs/synth_tiny

synth-plain:
	$(PY) runner.py -d "" --data-kind synthetic --model plain --size 64 \
	  --num-views 8 --epochs 2000 --batch-size 2048 --steps 48 \
	  --near 1.5 --far 4.5 -lr 5e-4 --outdir outputs/synth_plain

synth-ae:
	$(PY) runner.py -d "" --data-kind synthetic --model ae --size 64 \
	  --num-views 8 --epochs 2000 --batch-size 2048 --steps 48 \
	  --near 1.5 --far 4.5 -lr 5e-4 --latent-l2-weight 1e-4 \
	  --outdir outputs/synth_ae

synth-volsdf:
	$(PY) runner.py -d "" --data-kind synthetic --model volsdf --size 48 \
	  --num-views 8 --epochs 1500 --batch-size 1024 --steps 32 \
	  --near 1.5 --far 4.5 -lr 5e-4 --eikonal-weight 0.1 \
	  --outdir outputs/synth_volsdf

synth-dyn:
	$(PY) runner.py -d "" --data-kind synthetic-dyn --model plain \
	  --dyn-model plain --size 48 --num-views 12 --epochs 2000 \
	  --batch-size 1024 --steps 32 --near 1.5 --far 4.5 -lr 5e-4 \
	  --dp-weight 1e-3 --render-over-time 0 --outdir outputs/synth_dyn

synth-dyn-spline:
	$(PY) runner.py -d "" --data-kind synthetic-dyn --model plain \
	  --dyn-model plain --spline 4 --size 48 --num-views 12 --epochs 2000 \
	  --batch-size 1024 --steps 32 --near 1.5 --far 4.5 -lr 5e-4 \
	  --outdir outputs/synth_dyn_spline

synth-nerv:  # relighting: moving point lights + learned-occ shadows
	$(PY) runner.py -d "" --data-kind synthetic-lit --model volsdf \
	  --size 48 --num-views 8 --epochs 2000 --batch-size 1024 --steps 24 \
	  --near 1.5 --far 4.5 -lr 3e-4 --refl-kind diffuse \
	  --light-kind dataset --occ-kind learned --integrator-kind direct \
	  --eikonal-weight 0.05 --occ-decay-weight 1e-3 \
	  --outdir outputs/synth_nerv

synth-nerv-path:  # one-bounce path integration variant
	$(PY) runner.py -d "" --data-kind synthetic-lit --model volsdf \
	  --size 32 --num-views 8 --epochs 800 --batch-size 512 --steps 16 \
	  --near 1.5 --far 4.5 -lr 3e-4 --refl-kind diffuse \
	  --light-kind dataset --integrator-kind path \
	  --eikonal-weight 0.05 --outdir outputs/synth_nerv_path

synth-voxel:
	$(PY) runner.py -d "" --data-kind synthetic --model voxel --size 48 \
	  --num-views 8 --epochs 1500 --batch-size 2048 --steps 32 \
	  --near 1.5 --far 4.5 -lr 2e-2 --refl-kind pos --tv-sigma 1e-5 \
	  --outdir outputs/synth_voxel

synth-volsdf-alternate:  # alternate volume/surface supervision
	$(PY) runner.py -d "" --data-kind synthetic --model volsdf --size 48 \
	  --num-views 8 --epochs 1500 --batch-size 1024 --steps 32 \
	  --near 1.5 --far 4.5 -lr 5e-4 --eikonal-weight 0.1 \
	  --volsdf-alternate --alt-train 200 \
	  --outdir outputs/synth_volsdf_alt

synth-volsdf-to-path:  # checkpoint surgery: direct -> path conversion
	$(PY) runner.py -d "" --data-kind synthetic-lit --model volsdf \
	  --size 32 --num-views 8 --epochs 400 --batch-size 512 --steps 16 \
	  --near 1.5 --far 4.5 -lr 3e-4 --refl-kind diffuse \
	  --light-kind dataset --integrator-kind direct \
	  --save outputs/volsdf_direct/model.ckpt \
	  --outdir outputs/volsdf_direct
	$(PY) runner.py -d "" --data-kind synthetic-lit --model volsdf \
	  --size 32 --num-views 8 --epochs 400 --batch-size 512 --steps 16 \
	  --near 1.5 --far 4.5 -lr 3e-4 --refl-kind diffuse \
	  --light-kind dataset --integrator-kind direct \
	  --volsdf-direct-to-path --load outputs/volsdf_direct/model.ckpt \
	  --outdir outputs/volsdf_path

synth-pixel-single:
	$(PY) runner.py -d "" --data-kind synthetic --model pixel-single \
	  --size 48 --num-views 1 --epochs 1000 --batch-size 1024 --steps 24 \
	  --near 1.5 --far 4.5 -lr 5e-4 --outdir outputs/synth_pixel

# ---- dataset experiments (mirror the reference's canonical recipes) ------

original:  # NeRF-synthetic lego (reference makefile:8-13)
	$(PY) runner.py -d data/nerf_synthetic/lego --data-kind original \
	  --model plain --size 128 --epochs 50000 --batch-size 4096 \
	  --steps 64 -lr 5e-4 --mip cone --sigmoid-kind thin \
	  --outdir outputs/lego

volsdf:  # (reference makefile:21-28)
	$(PY) runner.py -d data/nerf_synthetic/lego --data-kind original \
	  --model volsdf --size 128 --epochs 50000 --batch-size 2048 \
	  --steps 64 -lr 5e-4 --eikonal-weight 0.1 --sdf-kind mlp \
	  --outdir outputs/lego_volsdf

dnerf:  # D-NeRF jumping jacks (reference makefile:105-114)
	$(PY) runner.py -d data/dnerf/jumpingjacks --data-kind dnerf \
	  --model plain --dyn-model plain --size 128 --epochs 80000 \
	  --batch-size 2048 --steps 64 -lr 5e-4 --dp-weight 1e-3 \
	  --outdir outputs/jumpingjacks

dnerf-spline:  # Spline-NeRF (the reference repo's paper model)
	$(PY) runner.py -d data/dnerf/jumpingjacks --data-kind dnerf \
	  --model plain --dyn-model plain --spline 5 --size 128 \
	  --epochs 80000 --batch-size 2048 --steps 64 -lr 5e-4 \
	  --outdir outputs/jumpingjacks_spline

dtu:  # (reference makefile:180-186)
	$(PY) runner.py -d data/DTU/scan97 --data-kind dtu --model volsdf \
	  --size 192 --epochs 60000 --batch-size 1024 --steps 64 -lr 5e-4 \
	  --eikonal-weight 0.1 --outdir outputs/dtu97

ae:  # (reference makefile:380-384)
	$(PY) runner.py -d data/nerf_synthetic/lego --data-kind original \
	  --model ae --size 128 --epochs 50000 --batch-size 4096 --steps 64 \
	  -lr 5e-4 --latent-l2-weight 1e-4 --outdir outputs/lego_ae

# ---- tooling --------------------------------------------------------------

test:
	$(PY) -m pytest tests/ -q -m "not slow"

test-all:
	$(PY) -m pytest tests/ -q

bench:
	$(PY) bench.py

.PHONY: synth-tiny synth-plain synth-ae synth-volsdf synth-dyn \
  synth-dyn-spline synth-nerv synth-nerv-path synth-voxel \
  synth-volsdf-alternate synth-volsdf-to-path synth-pixel-single \
  original volsdf dnerf dnerf-spline dtu ae test bench
