#!/bin/sh
# Fetch the reference's published room-H5 datasets (capability parity with
# SURVEY.md C26: the upstream download_data.sh pulls S3DIS/ScanNet H5s from
# its published Dropbox links). Run from the repo root; files land in data/.
#
# NOTE: this build environment is zero-egress — run this on a machine with
# network access, copying the canonical URLs from the upstream repo's
# download_data.sh (they rotate, so none are hardcoded here). Without
# network, generate the synthetic datasets instead:
#   python -m learn_region_grow_tpu.cli.generate_synthetic --data-dir data
set -e
mkdir -p data
cat <<'MSG'
Expected files in data/:
  s3dis_area1.h5 ... s3dis_area6.h5   (S3DIS rooms, 8-col layout)
  scannet.h5                          (312 ScanNet rooms)
Fetch them from the links in jingdao/learn_region_grow's download_data.sh,
or produce Semantic KITTI / vKITTI / BIM / synthetic data with the
cli.stage_* tools.
MSG
