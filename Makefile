.PHONY: test test-all bench native clean regate accuracy accuracy-crowded accuracy-crowded-s6 accuracy-blaze-back accuracy-blaze-back-finetune accuracy-ssd accuracy-ssd-mnv2 accuracy-ssd-sq accuracy-ov-sq accuracy-ov-0204 accuracy-res10 accuracy-blaze accuracy-ag accuracy-mtcnn accuracy-embed accuracy-s accuracy-official accuracy-int8 accuracy-facenet accuracy-reid accuracy-facenet512 accuracy-all

test:	# FAST lane (default -m filter in pyproject); see README Testing
	python -m pytest tests/ -q

test-all:	# every lane
	python -m pytest tests/ -q -m ""

bench:
	python bench.py

# the executed end-to-end accuracy result: train yolov5n on golden-face
# composites until the engine REALLY detects the 3 pinned faces
# (IoU >= 0.5 vs the reference golden boxes), checkpoint -> reload -> regate.
# Runs on the TPU; exits nonzero unless the reloaded checkpoint passes.
# The gate band 0.6+/-0.15 makes the checkpoint hold from 0.45 to 0.75 —
# including the CLI's reference-default --dt 0.70 (the committed checkpoint
# passes tests/test_golden_accuracy.py's band + IoU>=0.8 assertions).
accuracy:
	python -m face_detection_and_recognition_tpu.cli.train_golden \
		--out tests/data/golden_yolov5n_ckpt --steps 8000 \
		--gate-dt 0.6 --gate-margin 0.15

# same loop for the SSD family (MultiBox loss, train/ssd.py): res10-class
# detector trained to the golden gate at its native 300px
accuracy-ssd:
	python -m face_detection_and_recognition_tpu.cli.train_golden \
		--out tests/data/golden_ssd_ckpt --arch ssd-resnet10 --size 300 \
		--batch 32 --lr 0.002

# third family: blazeface-front at its fixed 128px (train/blazeface.py).
# NB the 128px input puts the golden faces at 7.6-15.8px — see the gate
# test's ceiling arithmetic (tests/test_golden_accuracy.py)
accuracy-blaze:
	python -m face_detection_and_recognition_tpu.cli.train_golden \
		--out tests/data/golden_blaze_ckpt --arch blazeface-front \
		--size 128 --batch 64 --steps 12000 --eval-every 400 --lr 0.002

# blazeface-back at its fixed 256px — the reference README's best blaze
# variant (30 FPS row); golden faces land at 15-32px, the reference's own
# 0.8 IoU bar is reachable and asserted. Round-5 recipe: a base run plus a
# fine-tune pass with composite faces CONCENTRATED on the gate's evaluated
# 12-45px band (the uniform 12.8-140px draw starves the sub-cell
# regression signal the 15px middle face needs)
accuracy-blaze-back:
	python -m face_detection_and_recognition_tpu.cli.train_golden \
		--out tests/data/golden_blaze_back_ckpt --arch blazeface-back \
		--size 256 --batch 32 --steps 12000 --eval-every 400 --lr 0.002 \
		--gate-iou 0.8

accuracy-blaze-back-finetune:
	python -m face_detection_and_recognition_tpu.cli.train_golden \
		--out tests/data/golden_blaze_back_ckpt --arch blazeface-back \
		--resume-from tests/data/golden_blaze_back_ckpt \
		--size 256 --batch 32 --steps 8000 --eval-every 400 --lr 0.0005 \
		--face-px 12,45 --gate-iou 0.8

# executed RECOGNITION accuracy: train the ArcFace embedder until the
# similar-face filter's own math separates the golden identities on
# held-out probes, checkpoint -> engine.load_embed_weights -> regate.
accuracy-embed:
	python -m face_detection_and_recognition_tpu.cli.train_golden_embed \
		--out tests/data/golden_embed_ckpt --identities 16 --steps 5000 \
		--batch 64 --aug-scale 2.0 --center-gain 0.03 --eval-every 250

bench-all:
	python benchmarks/bench_all.py

# re-execute EVERY committed golden-gate checkpoint on the current device
# (run on the TPU to refresh the PARITY.md executed-accuracy table)
regate:
	python benchmarks/regate_golden.py

native:
	$(MAKE) -C native

dryrun:
	python __graft_entry__.py

clean:
	$(MAKE) -C native clean
	find . -name __pycache__ -type d -exec rm -rf {} +

# fourth executed slot: the age/gender cascade trained to the reference's
# pinned golden labels (train/golden_ag.py; needs `make accuracy` first)
accuracy-ag:
	python -m face_detection_and_recognition_tpu.cli.train_golden_ag \
		--out tests/data/golden_ag_ckpt \
		--detector-ckpt tests/data/golden_yolov5n_ckpt

# sixth family: the MTCNN 3-stage cascade (per-stage crops + bootstrapped
# hard negatives, train/golden_mtcnn.py)
accuracy-mtcnn:
	python -m face_detection_and_recognition_tpu.cli.train_golden_mtcnn \
		--out tests/data/golden_mtcnn_ckpt --crops 12288 --steps 5000

# the facenet (InceptionResNetV1 128-d) slot through the same filter gate
accuracy-facenet:
	python -m face_detection_and_recognition_tpu.cli.train_golden_embed \
		--out tests/data/golden_facenet_ckpt --embedder facenet \
		--steps 5000 --lr 0.003 --batch 48 --train-per-id 192 \
		--identities 16 --aug-scale 2.0 --eval-every 250

# the OpenVINO face-reid MobileNetV2 256-d slot through the filter gate
accuracy-reid:
	python -m face_detection_and_recognition_tpu.cli.train_golden_embed \
		--out tests/data/golden_reid_ckpt --embedder reid-mnv2 \
		--steps 3500 --lr 0.005 --batch 48 --train-per-id 192 \
		--identities 16 --aug-scale 2.0 --eval-every 250

# the OpenVINO facenet_20180408 512-d slot — the fifth and last feat-net
# type of the reference's Net loader — through the filter gate
accuracy-facenet512:
	python -m face_detection_and_recognition_tpu.cli.train_golden_embed \
		--out tests/data/golden_facenet512_ckpt --embedder facenet-512 \
		--steps 3000 --lr 0.003 --batch 32 --train-per-id 192 \
		--identities 16 --eval-every 200

# the HEADLINE bench arch (bench.py) through the same executed gate;
# trained to the 0.45-0.75 band so the CLI's reference-default --dt 0.70
# sees all three faces (same contract as `make accuracy`)
accuracy-s:
	python -m face_detection_and_recognition_tpu.cli.train_golden \
		--out tests/data/golden_yolov5s_ckpt --arch yolov5s \
		--steps 8000 --gate-dt 0.6 --gate-margin 0.15

# the third yolov5-face base graph: the P6 four-level head (stride 64)
accuracy-n6:
	python -m face_detection_and_recognition_tpu.cli.train_golden \
		--out tests/data/golden_yolov5n6_ckpt --arch yolov5n6 \
		--steps 8000 --gate-dt 0.6 --gate-margin 0.15

# the EXACT public res10 deploy graph trained THROUGH the caffe graph
# interpreter (train/caffe_golden.py), exported to a real .caffemodel
accuracy-res10:
	python -m face_detection_and_recognition_tpu.cli.train_golden \
		--out tests/data/golden_res10_ckpt --arch res10-ssd --size 300 \
		--batch 32 --lr 0.001 --steps 8000 \
		--gate-dt 0.6 --gate-margin 0.15 \
		--export-caffemodel tests/data/golden_res10.caffemodel

# the OpenVINO-class SSD variants (reference modules/openvino/model.py
# face-detection-0204 / SqueezeNet-light slots) through the executed gate,
# trained to the same 0.45-0.75 band
accuracy-ssd-mnv2:
	python -m face_detection_and_recognition_tpu.cli.train_golden \
		--out tests/data/golden_ssd_mnv2_ckpt --arch ssd-mobilenetv2 \
		--size 448 --batch 16 --lr 0.002 --steps 8000 \
		--gate-dt 0.6 --gate-margin 0.15

accuracy-ssd-sq:
	python -m face_detection_and_recognition_tpu.cli.train_golden \
		--out tests/data/golden_ssd_sq_ckpt --arch ssd-squeezenet \
		--size 300 --batch 32 --lr 0.002 --steps 8000 \
		--gate-dt 0.6 --gate-margin 0.15

# the WIDER-regime checkpoint: yolov5n trained WITH crowded composites
# (16-48 faces/frame, 8-300px, rotation/overlap) so the crowded benchmark
# and the NMS-saturation tests run against a detector trained for that
# regime (tests/test_crowded_accuracy.py)
accuracy-crowded:
	python -m face_detection_and_recognition_tpu.cli.train_golden \
		--out tests/data/golden_yolov5n_crowded_ckpt --arch yolov5n \
		--steps 10000 --eval-every 400 --crowded \
		--gate-dt 0.6 --gate-margin 0.15

# the HIGH-RESOLUTION crowded checkpoint (round-5 VERDICT #1): yolov5s6's
# P6 stride-64 head at a 960px canvas, crowd-trained so the sub-10px
# rotated tail of the crowded regime keeps 1.5x the pixels yolov5n@640
# sees; evaluated by tests/test_crowded_accuracy.py at input 960 over the
# same seed-11 640px benchmark set
accuracy-crowded-s6:
	python -m face_detection_and_recognition_tpu.cli.train_golden \
		--out tests/data/golden_yolov5s6_crowded_ckpt --arch yolov5s6 \
		--size 960 --batch 8 --steps 12000 --eval-every 500 --lr 0.01 \
		--crowded --gate-dt 0.6 --gate-margin 0.15 --gate-iou 0.99

# the reference's REAL OpenVINO topologies (models/ov_topologies.py:
# face-detection-0204 / face-detection-retail-0004 per the OMZ model cards),
# trained THROUGH the differentiable IR interpreter to the 0.45-0.75 band,
# then exported as a real model.xml/bin and regated through the file path
accuracy-ov-sq:
	python -m face_detection_and_recognition_tpu.cli.train_golden \
		--out tests/data/golden_ov_sq_ckpt --arch ov-squeezenet-light \
		--size 300 --batch 32 --lr 0.001 --steps 8000 \
		--gate-dt 0.6 --gate-margin 0.15 \
		--export-ir tests/data/golden_ov_sq.xml

accuracy-ov-0204:
	python -m face_detection_and_recognition_tpu.cli.train_golden \
		--out tests/data/golden_ov_0204_ckpt --arch ov-0204 \
		--size 448 --batch 16 --lr 0.001 --steps 8000 \
		--gate-dt 0.6 --gate-margin 0.15 \
		--export-ir tests/data/golden_ov_0204.xml

# the official (multiclass, landmark-less) yolov5 path through the executed
# gate: nc=80 head trained with faces as class 0, decoded via
# yolov5_official_postprocess (reference onnx_utils.py:193-288)
accuracy-official:
	python -m face_detection_and_recognition_tpu.cli.train_golden \
		--out tests/data/golden_yolov5n_official_ckpt \
		--arch yolov5n-official --steps 8000 \
		--gate-dt 0.6 --gate-margin 0.15

# executed int8 accuracy: quantize the trained yolov5n checkpoint (BN fold,
# per-channel int8 weights, static calibrated activation scales) and re-run
# the SAME golden gate through a quantized="static" engine
accuracy-int8:
	python -m face_detection_and_recognition_tpu.cli.quantize_golden \
		--ckpt tests/data/golden_yolov5n_ckpt \
		--out tests/data/golden_yolov5n_int8_ckpt

# every executed-accuracy loop in sequence (hours of TPU time)
accuracy-all: accuracy accuracy-s accuracy-official accuracy-ssd \
		accuracy-ssd-mnv2 accuracy-ssd-sq \
		accuracy-blaze accuracy-mtcnn accuracy-ag accuracy-embed \
		accuracy-facenet accuracy-reid accuracy-facenet512 accuracy-int8
