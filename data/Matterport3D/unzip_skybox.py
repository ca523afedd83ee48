#!/usr/bin/env python
"""Unzip downloaded MP3D skybox archives (reference data/Matterport3D/unzip_skybox.py)."""
import os
import zipfile
from glob import glob

for z in glob(os.path.join("data", "Matterport3D", "v1", "scans", "*", "*.zip")):
    out = os.path.dirname(z)
    print("unzipping", z)
    with zipfile.ZipFile(z) as f:
        f.extractall(out)
