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

# ---- reference recipe parity ----------------------------------------------
# Same target names as the reference's makefile so its users find every
# canned experiment here; flags are mapped onto this runner's surface
# (reference aliases are accepted, e.g. --sdf-eikonal == --eikonal-weight).
# Each recipe cites the reference makefile lines it mirrors. Dataset paths
# match the reference's data/ layout. Where a reference recipe is broken
# upstream (a flag its own runner never defines, a missing script), the
# working equivalent is used and noted.

dnerf_dataset ?= bouncingballs
scan_number ?= 83
nerv_dataset ?= armadillo
nerfactor_ds ?= pinecone

clean:  # (ref makefile:3-6)
	-rm -f outputs/*.png outputs/results.txt outputs/*.mp4

coarse_fine:  # hierarchical coarse+fine NeRF on lego (ref makefile:15-19)
	$(PY) runner.py -d data/nerf_synthetic/lego --data-kind original \
	  --model coarse_fine --size 64 --epochs 80000 --batch-size 2048 \
	  --steps 64 -lr 3e-4 --loss-fns l2 --refl-kind view \
	  --save outputs/lego_cf/model.ckpt --outdir outputs/lego_cf

voxel:  # direct-optimized voxel grid on lego (ref makefile:30-34)
	$(PY) runner.py -d data/nerf_synthetic/lego --data-kind original \
	  --model voxel --size 64 --epochs 5000 --batch-size 4096 --steps 64 \
	  -lr 1e-2 --loss-fns l2 --nosave --outdir outputs/lego_voxel

dyn_voxel:  # dynamic voxel grid, bezier spline motion (ref makefile:36-46)
	$(PY) runner.py -d data/dynamic/$(dnerf_dataset) --data-kind dnerf \
	  --model voxel --dyn-model voxel --size 128 --epochs 50000 \
	  --batch-size 2048 --steps 80 -lr 1e-2 --spline 4 \
	  --voxel-tv-sigma 1e-3 --voxel-tv-rgb 1e-4 --voxel-tv-bezier 1e-4 \
	  --voxel-tv-rigidity 1e-4 --offset-decay 30 --ffjord-div-decay 0.3 \
	  --sigmoid-kind upshifted --refl-kind pos-linear-view \
	  --depth-images --flow-map --rigidity-map --notraintest \
	  --save outputs/dvoxel_$(dnerf_dataset)/model.ckpt \
	  --outdir outputs/dvoxel_$(dnerf_dataset)

volsdf_with_normal:  # elaz-normal basic BRDF (ref makefile:48-55)
	$(PY) runner.py -d data/nerf_synthetic/lego --data-kind original \
	  --model volsdf --sdf-kind mlp --size 192 --epochs 50000 \
	  --batch-size 2048 --steps 64 -lr 1e-3 --sdf-eikonal 0.1 \
	  --sigmoid-kind fat --refl-kind basic --normal-kind elaz \
	  --light-kind point --nosave --outdir outputs/lego_volsdf_normal

rusin:  # Rusinkiewicz-parameterized BRDF (ref makefile:57-64)
	$(PY) runner.py -d data/nerf_synthetic/lego --data-kind original \
	  --model volsdf --sdf-kind mlp --size 64 --epochs 50000 \
	  --batch-size 1024 --steps 64 -lr 1e-3 --sdf-eikonal 0.1 \
	  --sigmoid-kind fat --light-kind field --refl-kind rusin --nosave \
	  --outdir outputs/lego_rusin

nerf-sh:  # spherical-harmonic reflectance eval (ref makefile:66-75)
	$(PY) runner.py -d data/nerfactor/$(nerfactor_ds) --data-kind original \
	  --model plain --size 128 --epochs 0 --batch-size 2048 --steps 64 \
	  -lr 1e-3 --sigmoid-kind leaky_relu --refl-kind sph-har \
	  --depth-images --normals-from-depth --notest \
	  --save outputs/$(nerfactor_ds)_sh/model.ckpt \
	  --outdir outputs/$(nerfactor_ds)_sh

nerfactor_volsdf:  # relightable volsdf on nerfactor (ref makefile:77-89;
	# the ref's literal `--sdf-eikonal 1e-t` is not a number — 0.1 here)
	$(PY) runner.py -d data/nerfactor/$(nerfactor_ds) --data-kind original \
	  --model volsdf --sdf-kind mlp --size 256 --epochs 50000 \
	  --batch-size 2048 --steps 64 -lr 1e-4 --light-kind field \
	  --occ-kind all-learned --loss-fns l2 rmse \
	  --color-spaces rgb xyz hsv --sigmoid-kind leaky_relu \
	  --refl-kind diffuse --depth-images --normals-from-depth \
	  --depth-query-normal --notest --sdf-eikonal 0.1 \
	  --save outputs/$(nerfactor_ds)_volsdf/model.ckpt \
	  --outdir outputs/$(nerfactor_ds)_volsdf

nerfactor_volsdf_direct:  # siren SDF + rusin BRDF (ref makefile:91-102)
	$(PY) runner.py -d data/nerfactor/$(nerfactor_ds) --data-kind original \
	  --model volsdf --sdf-kind siren --size 128 --epochs 50000 \
	  --batch-size 2048 --steps 64 -lr 1e-3 --occ-kind all-learned \
	  --refl-kind rusin --light-kind field --color-spaces rgb \
	  --depth-images --normals-from-depth --sdf-eikonal 1e-2 \
	  --smooth-normals 1e-2 --smooth-eps-rng --notest \
	  --save outputs/$(nerfactor_ds)_volsdfd/model.ckpt \
	  --outdir outputs/$(nerfactor_ds)_volsdfd

food:  # NeX shiny dataset through the AE model (ref makefile:106-109)
	$(PY) runner.py -d data/food --data-kind shiny --model ae --size 64 \
	  --epochs 50000 --batch-size 2048 --steps 64 -lr 5e-4 --no-sched \
	  --save outputs/food/model.ckpt --outdir outputs/food

dnerf_original:  # D-NeRF, direct Δx warp (no spline; ref makefile:112-125)
	$(PY) runner.py -d data/dynamic/$(dnerf_dataset) --data-kind dnerf \
	  --model plain --dyn-model plain --size 32 --epochs 50000 \
	  --batch-size 2048 --steps 64 -lr 1e-3 --sigmoid-kind upshifted \
	  --refl-kind pos --render-over-time 8 --depth-images --flow-map \
	  --rigidity-map --offset-decay 30 --ffjord-div-decay 0.3 \
	  --notraintest --save outputs/dyn_n_$(dnerf_dataset)/model.ckpt \
	  --outdir outputs/dyn_n_$(dnerf_dataset)

dnerf_volsdf:  # dynamic volsdf (ref makefile:127-133)
	$(PY) runner.py -d data/dynamic/$(dnerf_dataset) --data-kind dnerf \
	  --model volsdf --sdf-kind mlp --dyn-model plain --spline 6 \
	  --size 128 --epochs 50000 --batch-size 2048 --steps 64 -lr 3e-4 \
	  --refl-kind pos-linear-view --sigmoid-kind upshifted \
	  --render-over-time 12 --sdf-eikonal 1e-5 --notraintest \
	  --save outputs/dvs_$(dnerf_dataset)/model.ckpt \
	  --outdir outputs/dvs_$(dnerf_dataset)

gibson:  # long indoor video as a dnerf set (ref makefile:135-143)
	$(PY) runner.py -d data/gibson_dataset --data-kind dnerf --model plain \
	  --dyn-model plain --spline 12 --size 256 --epochs 100000 \
	  --batch-size 1024 --steps 64 --near 1e-3 --far 8 -lr 1e-4 \
	  --refl-kind pos-linear-view --sigmoid-kind fat --opt-step 5 \
	  --depth-images --rigidity-map --flow-map --offset-decay 30 \
	  --ffjord-div-decay 0.3 --notraintest \
	  --save outputs/gibson/model.ckpt --outdir outputs/gibson

long_dnerf:  # segmented long-video dynamic model (ref makefile:145-152)
	$(PY) runner.py -d data/dynamic/$(dnerf_dataset) --data-kind dnerf \
	  --model plain --dyn-model long --spline 5 --long-vid-segments 8 \
	  --size 64 --epochs 50000 --batch-size 1024 --steps 64 -lr 3e-4 \
	  --refl-kind pos --sigmoid-kind upshifted --loss-fns l2 fft \
	  --clip-gradients 1 --render-over-time 8 --depth-images \
	  --notraintest --save outputs/ldyn_$(dnerf_dataset)/model.ckpt \
	  --outdir outputs/ldyn_$(dnerf_dataset)

dex:  # transparent-object clutter, depth vis (ref makefile:154-159)
	$(PY) runner.py -d data/dex_nerf/dex_nerf_simulated_clutter_light_array \
	  --data-kind original --model plain --size 64 --epochs 80000 \
	  --batch-size 2048 --steps 64 --near 2 --far 10 -lr 5e-4 \
	  --refl-kind view --visualize depth \
	  --save outputs/clutter/model.ckpt --outdir outputs/clutter

dnerf_gru:  # recurrent dynamic AE (ref makefile:161-165; the reference's
	# --gru-flow flag does not exist in its own runner — the EncodedGRU
	# model below is the working equivalent on the same data)
	$(PY) runner.py -d data/dynamic/$(dnerf_dataset) --data-kind dnerf \
	  --model ae --dyn-model ae --size 64 --epochs 80000 \
	  --batch-size 2048 --steps 64 -lr 1e-3 --no-sched \
	  --save outputs/djj_gru_ae/model.ckpt --outdir outputs/djj_gru_ae

dnerf_dyn:  # dnerfae: AE canonical + AE warp, serialized frame sampling
	# with time-gamma weighting (ref makefile:167-172)
	$(PY) runner.py -d data/dynamic/jumpingjacks --data-kind dnerf \
	  --model ae --dyn-model ae --size 64 --epochs 80000 \
	  --batch-size 1024 --steps 64 -lr 5e-4 --no-sched --serial-idxs \
	  --time-gamma --save outputs/djj_gamma/model.ckpt \
	  --outdir outputs/djj_gamma

sdf:  # pure SDF surface rendering w/ silhouette loss (ref makefile:174-180)
	$(PY) runner.py -d data/nerf_synthetic/lego --data-kind original \
	  --model sdf --sdf-kind mlp --size 128 --epochs 5000 \
	  --batch-size 4096 -lr 5e-4 --sdf-eikonal 0.1 --loss-fns l2 \
	  --nosave --outdir outputs/lego_sdf

dtu_diffuse:  # relightable DTU w/ learned occlusion (ref makefile:189-199)
	$(PY) runner.py -d data/DTU/scan$(scan_number) --data-kind dtu \
	  --model volsdf --sdf-kind siren --size 128 --epochs 10000 \
	  --batch-size 1024 --steps 64 --near 0.4 --far 2 -lr 3e-4 \
	  --light-kind field --refl-kind diffuse --occ-kind all-learned \
	  --depth-images --depth-query-normal --normals-from-depth \
	  --msssim-loss --sdf-eikonal 1e-5 \
	  --sigmoid-kind upshifted_softplus --notraintest \
	  --save outputs/dtu_diffuse_$(scan_number)/model.ckpt \
	  --outdir outputs/dtu_diffuse_$(scan_number)

dtu_diffuse_lit:  # re-light a trained DTU model with an explicit point
	# light via checkpoint surgery (ref makefile:201-209)
	$(PY) runner.py -d data/DTU/scan$(scan_number) --data-kind dtu \
	  --model volsdf --sdf-kind mlp --size 200 --epochs 1 --nosave \
	  --batch-size 512 --steps 64 --near 0.01 --far 1.3 -lr 5e-4 \
	  --light-kind point --point-light-position 0 -8 8 \
	  --light-intensity 4000 --refl-kind diffuse --all-learned-to-joint \
	  --replace light --render-frame 13 --notraintest \
	  --load outputs/dtu_diffuse_$(scan_number)/model.ckpt \
	  --outdir outputs/dtu_diffuse_lit_$(scan_number)

# -- NeRV relighting family (ref makefile:211-366)

nerv_point:  # curl-mlp SDF + rusin BRDF + learned occ (ref makefile:215-228)
	$(PY) runner.py -d data/nerv_public_release/$(nerv_dataset) \
	  --data-kind nerv_point --model volsdf --sdf-kind curl-mlp \
	  --size 200 --epochs 50000 --batch-size 1024 --steps 64 -lr 3e-4 \
	  --refl-kind rusin --light-kind dataset --loss-fns l2 rmse \
	  --occ-kind all-learned --all-learned-occ-kind pos-elaz \
	  --has-multi-light --depth-images --depth-query-normal \
	  --normals-from-depth --msssim-loss --display-smoothness \
	  --gamma-correct --skip-loss 100 --seed -1 --notraintest \
	  --save outputs/nerv_$(nerv_dataset)/model.ckpt \
	  --outdir outputs/nerv_$(nerv_dataset)

nerv_point_diffuse:  # diffuse BRDF + const-learned occ (ref makefile:230-246)
	$(PY) runner.py -d data/nerv_public_release/$(nerv_dataset) \
	  --data-kind nerv_point --model volsdf --sdf-kind mlp --size 100 \
	  --epochs 25000 --batch-size 1024 --steps 64 -lr 3e-4 \
	  --refl-kind diffuse --sdf-eikonal 1 --light-kind dataset \
	  --loss-fns l2 rmse --occ-kind learned-const --replace occ \
	  --color-spaces rgb xyz hsv --depth-images --depth-query-normal \
	  --sigmoid-kind leaky_relu --skip-loss 100 --clip-gradients 1 \
	  --normals-from-depth --msssim-loss --display-smoothness --seed -1 \
	  --notraintest --save outputs/nerv_diffuse_$(nerv_dataset)/model.ckpt \
	  --outdir outputs/nerv_diffuse_$(nerv_dataset)

nerv_point_diffuse_unknown_lighting:  # light-field instead of dataset
	# lights (ref makefile:248-262)
	$(PY) runner.py -d data/nerv_public_release/$(nerv_dataset) \
	  --data-kind nerv_point --model volsdf --sdf-kind mlp --size 200 \
	  --epochs 50000 --batch-size 1024 --steps 64 -lr 1e-4 \
	  --refl-kind diffuse --sdf-eikonal 1 --light-kind field \
	  --loss-fns l2 rmse --occ-kind all-learned \
	  --color-spaces rgb xyz hsv --depth-images --depth-query-normal \
	  --sigmoid-kind sin --skip-loss 100 --replace sigmoid \
	  --clip-gradients 1 --normals-from-depth --msssim-loss \
	  --display-smoothness --seed -1 --notraintest \
	  --save outputs/nerv_diff_ul_$(nerv_dataset)/model.ckpt \
	  --outdir outputs/nerv_diff_ul_$(nerv_dataset)

nerv_point_diffuse_to_learned:  # surgery: diffuse -> learned alternating
	# refl, training only refl+occ (ref makefile:264-281)
	$(PY) runner.py -d data/nerv_public_release/$(nerv_dataset) \
	  --name learned_from_diffuse$(nerv_dataset) \
	  --data-kind nerv_point --model volsdf --sdf-kind mlp --size 200 \
	  --epochs 50000 --batch-size 1024 --steps 64 -lr 8e-4 \
	  --sdf-eikonal 1 --light-kind dataset --loss-fns l2 rmse \
	  --occ-kind all-learned --color-spaces rgb hsv xyz --depth-images \
	  --depth-query-normal --sigmoid-kind tanh --skip-loss 100 \
	  --normals-from-depth --msssim-loss --display-smoothness --seed -1 \
	  --train-parts refl occ --convert-analytic-to-alt --notraintest \
	  --load outputs/nerv_diffuse_$(nerv_dataset)/model.ckpt \
	  --save outputs/nerv_from_diffuse_$(nerv_dataset)/model.ckpt \
	  --outdir outputs/nerv_from_diffuse_$(nerv_dataset)

nerv_point_alt_to_pathtrace:  # surgery: direct -> one-bounce path
	# integrator (ref makefile:283-297)
	$(PY) runner.py -d data/nerv_public_release/$(nerv_dataset) \
	  --name pathtrace_$(nerv_dataset) --data-kind nerv_point \
	  --model volsdf --size 32 --epochs 50000 --batch-size 512 \
	  --steps 32 -lr 2e-4 --sdf-eikonal 1 --light-kind dataset \
	  --loss-fns l2 rmse --occ-kind all-learned \
	  --color-spaces rgb hsv xyz --depth-images --depth-query-normal \
	  --skip-loss 100 --normals-from-depth --msssim-loss \
	  --display-smoothness --seed -1 --volsdf-direct-to-path \
	  --notraintest \
	  --load outputs/nerv_diffuse_$(nerv_dataset)/model.ckpt \
	  --save outputs/nerv_path_final_$(nerv_dataset)/model.ckpt \
	  --outdir outputs/nerv_path_final_$(nerv_dataset)

nerv_point_final:  # eval-only render of the pathtraced model
	# (ref makefile:299-309)
	$(PY) runner.py -d data/nerv_public_release/$(nerv_dataset) \
	  --name final_$(nerv_dataset) --data-kind nerv_point --model volsdf \
	  --size 200 --epochs 0 --batch-size 512 --steps 64 \
	  --light-kind dataset --depth-images --depth-query-normal \
	  --normals-from-depth --msssim-loss --notraintest --nosave \
	  --load outputs/nerv_path_final_$(nerv_dataset)/model.ckpt \
	  --outdir outputs/nerv_final_$(nerv_dataset)

nerv_point_sdf:  # SDF surface renderer + multi-rusin (ref makefile:311-322)
	$(PY) runner.py -d data/nerv_public_release/$(nerv_dataset) \
	  --data-kind nerv_point --model sdf --sdf-kind mlp --size 200 \
	  --epochs 20000 --batch-size 1024 -lr 5e-4 --refl-kind weighted \
	  --weighted-subrefl-kinds rusin rusin rusin --sdf-eikonal 0.1 \
	  --light-kind dataset --loss-fns l2 l1 rmse \
	  --color-spaces rgb hsv xyz --occ-kind learned \
	  --sdf-isect-kind bisect --integrator-kind direct --seed -1 \
	  --save outputs/nerv_sdf_$(nerv_dataset)/model.ckpt \
	  --outdir outputs/nerv_sdf_$(nerv_dataset)

nerv_point_alternating:  # alternating surface/volume supervision
	# (ref makefile:310-320)
	$(PY) runner.py -d data/nerv_public_release/$(nerv_dataset) \
	  --data-kind nerv_point --model volsdf --sdf-kind mlp --size 200 \
	  --epochs 50000 --batch-size 1024 --steps 64 -lr 5e-4 \
	  --refl-kind rusin --sdf-eikonal 0.1 --light-kind dataset \
	  --loss-fns l1 l2 --occ-kind all-learned --volsdf-alternate \
	  --sdf-isect-kind bisect --color-spaces rgb hsv xyz --seed -1 \
	  --notraintest --save outputs/nerv_alt_$(nerv_dataset)/model.ckpt \
	  --outdir outputs/nerv_alt_$(nerv_dataset)

nerv_point_path:  # one-bounce path integration (ref makefile:323-337)
	$(PY) runner.py -d data/nerv_public_release/$(nerv_dataset) \
	  --data-kind nerv_point --model volsdf --sdf-kind mlp --size 32 \
	  --epochs 20000 --batch-size 512 --steps 32 -lr 5e-4 \
	  --refl-kind rusin --sdf-eikonal 0.1 --light-kind dataset \
	  --loss-fns l2 --occ-kind all-learned --color-spaces rgb \
	  --integrator-kind path --depth-images --skip-loss 500 \
	  --smooth-eps 2e-3 --smooth-occ 1e-3 \
	  --sigmoid-kind upshifted_softplus --normals-from-depth \
	  --msssim-loss --display-smoothness --smooth-normals 1e-3 \
	  --seed -1 --notraintest \
	  --save outputs/nerv_path_$(nerv_dataset)/model.ckpt \
	  --outdir outputs/nerv_path_$(nerv_dataset)

nerv_point_subrefl:  # weighted sub-BRDF mixture (ref makefile:339-350)
	$(PY) runner.py -d data/nerv_public_release/$(nerv_dataset) \
	  --data-kind nerv_point --model volsdf --sdf-kind mlp --size 200 \
	  --epochs 30000 --batch-size 1024 --steps 64 -lr 3e-4 \
	  --refl-kind weighted --sdf-eikonal 0.1 --light-kind dataset \
	  --loss-fns l2 rmse --occ-kind all-learned \
	  --color-spaces rgb hsv xyz --omit-bg --seed -1 --notraintest \
	  --save outputs/nerv_weighted_$(nerv_dataset)/model.ckpt \
	  --outdir outputs/nerv_weighted_$(nerv_dataset)

nerv_point_fourier:  # fourier-basis BRDF (ref makefile:352-366)
	$(PY) runner.py -d data/nerv_public_release/$(nerv_dataset) \
	  --data-kind nerv_point --model volsdf --sdf-kind mlp --size 200 \
	  --epochs 50000 --batch-size 1024 --steps 64 -lr 8e-4 \
	  --refl-kind fourier --sdf-eikonal 0.1 --light-kind dataset \
	  --loss-fns l2 rmse --occ-kind all-learned \
	  --color-spaces rgb hsv xyz --depth-images --smooth-normals 1e-3 \
	  --smooth-eps 1e-3 --normals-from-depth --msssim-loss \
	  --display-smoothness --smooth-surface 1e-3 \
	  --sdf-isect-kind bisect --draw-colormap --seed -1 --notraintest \
	  --save outputs/nerv_fourier_$(nerv_dataset)/model.ckpt \
	  --outdir outputs/nerv_fourier_$(nerv_dataset)

# -- end NeRV family

test_original:  # eval-only integration smoke (ref makefile:368-371)
	$(PY) runner.py -d data/nerf_synthetic/lego --data-kind original \
	  --model plain --size 64 --epochs 0 --batch-size 2048 --steps 64 \
	  --load outputs/lego/model.ckpt --outdir outputs/lego_eval

bendy:  # curved rays through a learned IOR field (ref makefile:373-377)
	$(PY) runner.py -d data/nerf_synthetic/lego --data-kind original \
	  --model plain --bendy --size 64 --epochs 80000 --batch-size 2048 \
	  --steps 64 -lr 1e-3 --refl-kind pos \
	  --save outputs/bendy_lego/model.ckpt --outdir outputs/bendy_lego

og_upsample:  # render low-res features, neural-upsample (ref makefile:385-389)
	$(PY) runner.py -d data/nerf_synthetic/lego --data-kind original \
	  --model plain --render-size 16 --size 64 --epochs 80000 \
	  --batch-size 2048 --steps 64 -lr 5e-4 --no-sched \
	  --neural-upsample --nosave --outdir outputs/lego_up

rig_nerf:  # point-rig structured NeRF (ref makefile:391-396)
	$(PY) runner.py -d data/nerf_synthetic/lego --data-kind original \
	  --model rig --size 128 --epochs 50000 --batch-size 2048 \
	  --steps 64 -lr 2e-4 --sigmoid-kind fat --loss-fns fft l2 \
	  --refl-kind view --depth-images --seed -1 --notraintest \
	  --save outputs/rig_lego/model.ckpt --outdir outputs/rig_lego

dyn_rig_nerf:  # dynamic rig on dnerf data (ref makefile:398-406)
	$(PY) runner.py -d data/dynamic/$(dnerf_dataset) --data-kind dnerf \
	  --model rig --dyn-model rig --size 100 --epochs 100000 \
	  --batch-size 2048 --steps 64 -lr 1e-4 --sigmoid-kind fat \
	  --loss-fns fft --refl-kind pos --spline 5 --render-over-time 8 \
	  --depth-images --seed -1 --notraintest \
	  --save outputs/dyn_rig_$(dnerf_dataset)/model.ckpt \
	  --outdir outputs/dyn_rig_$(dnerf_dataset)

pixel_single:  # single-image conditioned NeRF (ref makefile:408-411)
	$(PY) runner.py -d data/celeba_example.jpg --data-kind pixel-single \
	  --model pixel-single --render-size 16 --mip cylinder \
	  --batch-size 1024 --steps 24 \
	  --save outputs/celeba_sp/model.ckpt --outdir outputs/celeba_sp

mpi:  # multi-plane images (ref makefile:436-440)
	$(PY) runner.py -d data/nerf_synthetic/lego --data-kind original \
	  --model mpi --size 64 --epochs 30000 --batch-size 2048 -lr 1e-4 \
	  --refl-kind pos --train-imgs 1 \
	  --save outputs/lego_mpi/model.ckpt --outdir outputs/lego_mpi

spline:  # SplineNeRF eval (ref makefile:496-503)
	$(PY) runner.py -d data/nerf_synthetic/lego --data-kind original \
	  --model spline --size 128 --epochs 0 --batch-size 2048 --steps 64 \
	  -lr 3e-4 --refl-kind view --sigmoid-kind upshifted --depth-images \
	  --notraintest --load outputs/lego_spline/model.ckpt \
	  --outdir outputs/lego_spline

uniform_adam:  # Laplacian-smoothed UniformAdam optimizer (ref makefile:505-509)
	$(PY) runner.py -d data/nerf_synthetic/lego --data-kind original \
	  --model plain --size 128 --epochs 80000 --batch-size 2048 \
	  --steps 64 -lr 3e-4 --opt-kind uniform_adam --refl-kind view \
	  --save outputs/lego_uni/model.ckpt --outdir outputs/lego_uni

rnn_nerf:  # EncodedGRU coarse-to-fine pyramid (ref makefile:456-461 calls
	# rnn_runner.py, which does not exist upstream — this is the working
	# equivalent through the main runner)
	$(PY) runner.py -d data/nerf_synthetic/lego --data-kind original \
	  --model recurrent --size 64 --epochs 7500 --batch-size 2048 \
	  --steps 32 -lr 1e-3 --save outputs/rnn_lego/model.ckpt \
	  --outdir outputs/rnn_lego

# -- single-video targets (ref makefile:463-494). The reference's
# `--segments` flag does not exist in its own runner; the working flag
# here is --long-vid-segments.

monsune:  # music-video clip, long dyn model (ref makefile:463-470)
	$(PY) runner.py -d data/video/monsune_outta_my_mind.mp4 \
	  --data-kind single_video --model plain --dyn-model long --spline 4 \
	  --long-vid-segments 8 --start-sec 46 --end-sec 48 --size 64 \
	  --epochs 30000 --batch-size 1024 --steps 32 --near 0.01 --far 3 \
	  -lr 3e-4 --loss-fns l2 fft --refl-kind pos --sigmoid-kind fat \
	  --train-imgs 20 --train-parts camera all --depth-images --notest \
	  --save outputs/monsune/model.ckpt --outdir outputs/monsune

fencing:  # camera-training video eval (ref makefile:472-481)
	$(PY) runner.py -d data/video/fencing.mp4 --data-kind single_video \
	  --model plain --dyn-model long --spline 4 --long-vid-segments 10 \
	  --start-sec 47 --end-sec 49 --size 100 --epochs 0 \
	  --batch-size 1024 --steps 32 --near 0.01 --far 2 -lr 8e-5 \
	  --loss-fns l2 fft --refl-kind pos --sigmoid-kind upshifted \
	  --clip-gradients 1 --train-imgs 40 --train-parts camera all \
	  --no-sched --seed -1 --render-over-time 0 --depth-images --notest \
	  --load outputs/fencing_video/model.ckpt \
	  --cam-save-load outputs/fencing_cam.ckpt --outdir outputs/fencing

dance_off:  # progressive long-video training (ref makefile:483-494)
	$(PY) runner.py -d data/video/shoichi_chris_small.mp4 \
	  --data-kind single_video --model plain --dyn-model long --spline 6 \
	  --size 512 --epochs 10000 --batch-size 1024 --steps 32 -lr 5e-4 \
	  --loss-fns l2 fft --refl-kind pos-linear-view --sigmoid-kind fat \
	  --end-sec 15 --long-vid-progressive-train 5 --dyn-refl-latent 32 \
	  --static-vid-cam-angle-deg 75 --render-over-time-end-sec 15 \
	  --render-over-time 0 --depth-images --flow-map --rigidity-map \
	  --opt-step 3 --seed -1 --notraintest --notest \
	  --save outputs/dance_off/model.ckpt --outdir outputs/dance_off

# -- script experiments (ref makefile:415-434, 442-453)

gan_sdf:  # adversarial SDF fit to a sphere (ref makefile:415-417)
	$(PY) scripts/gan_sdf.py --steps 15000 --batch 1000 \
	  --render-size 256 --out outputs/gan_sdf

volsdf_gan:  # GAN-distill a trained volsdf surface (ref makefile:419-423)
	$(PY) scripts/gan_sdf.py --steps 25000 --batch 900 \
	  --target checkpoint --load outputs/lego_volsdf/model.ckpt \
	  --g-model mlp --render-size 256 --out outputs/volsdf_gan

volsdf_gan_no_refl:  # (ref makefile:425-428)
	$(PY) scripts/gan_sdf.py --steps 25000 --batch 1024 \
	  --target checkpoint --load outputs/lego_volsdf/model.ckpt \
	  --g-model mlp --render-size 128 --out outputs/volsdf_gan_no_refl

project_pts:  # project rig points through trained cameras
	# (ref makefile:430-432; the ref's script exits before running)
	$(PY) scripts/project_pts.py --load outputs/rig_lego/model.ckpt \
	  --size 128 --out outputs/rig_projection

psp:  # spring-sim physics on a trained rig (ref makefile:434; the ref
	# imports a module that does not exist — this one runs)
	$(PY) scripts/rig_physics.py --points 16 --steps 200 \
	  --out outputs/rig_physics.npz

eval_rusin:  # BRDF slice plots from a rusin checkpoint (ref makefile:442-444)
	$(PY) scripts/eval_rusin.py \
	  --load outputs/nerv_$(nerv_dataset)/model.ckpt \
	  --out outputs/rusin_eval.png

fieldgan:  # stylized evolving 2D field GAN (ref makefile:446-448)
	$(PY) scripts/fieldgan.py --style data/mondrian.jpg --steps 2500 \
	  --out outputs/fieldgan

generate_animation:  # 2D spline-recon animation (ref makefile:510)
	$(PY) scripts/2d_recon.py --out outputs/2d_recon

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
  original volsdf dnerf dnerf-spline dtu ae clean coarse_fine voxel \
  dyn_voxel volsdf_with_normal rusin nerf-sh nerfactor_volsdf \
  nerfactor_volsdf_direct food dnerf_original dnerf_volsdf gibson \
  long_dnerf dex dnerf_gru dnerf_dyn sdf dtu_diffuse dtu_diffuse_lit \
  nerv_point nerv_point_diffuse nerv_point_diffuse_unknown_lighting \
  nerv_point_diffuse_to_learned nerv_point_alt_to_pathtrace \
  nerv_point_final nerv_point_sdf nerv_point_alternating \
  nerv_point_path nerv_point_subrefl nerv_point_fourier test_original \
  bendy og_upsample rig_nerf dyn_rig_nerf pixel_single mpi spline \
  uniform_adam rnn_nerf monsune fencing dance_off gan_sdf volsdf_gan \
  volsdf_gan_no_refl project_pts psp eval_rusin fieldgan \
  generate_animation test test-all bench
