"""Domain-shaped fixture generator (FIXTURES.md §B) — deterministic, seed=42.

Builds the reference's data model (SURVEY §1.3 normalized schemas) as
in-memory pandas frames / Spark DataFrames: ``images`` (B1), ``features``
(B2), ``updates`` (B3), plus synthetic image *bytes* with real JPEG/PNG/GIF
headers so the C8 sniffing path runs on honest input.
"""

from __future__ import annotations

import hashlib
import struct
from dataclasses import dataclass
from datetime import datetime, timedelta

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

SEED = 42


def _sha1_hex(i: int) -> str:
    return hashlib.sha1(f"img-{i}".encode()).hexdigest().upper()


def fake_image_bytes(fmt: str, width: int, height: int, payload: bytes) -> bytes:
    """Minimal valid header of ``fmt`` + payload bytes (C8-sniffable)."""
    if fmt == "PNG":
        return (
            b"\x89PNG\r\n\x1a\n"
            + b"\x00\x00\x00\rIHDR"
            + struct.pack(">II", width, height)
            + payload
        )
    if fmt == "GIF":
        return b"GIF89a" + struct.pack("<HH", width, height) + payload
    if fmt == "JPEG":
        # SOI + APP0 stub + SOF0 with dims
        sof = b"\xff\xc0" + struct.pack(">H", 11) + b"\x08" + struct.pack(
            ">HH", height, width
        ) + b"\x01\x00\x00"
        return b"\xff\xd8" + sof + payload
    return b"<svg>" + payload  # SVG rows exercise the F3 skip-list


@dataclass
class DomainFixtures:
    images: pd.DataFrame
    features: pd.DataFrame
    updates: pd.DataFrame

    def to_spark(self, spark: SparkSession) -> dict[str, DataFrame]:
        images = spark.createDataFrame(self.images)
        features = spark.createDataFrame(
            self.features,
            "sha1 string, extr_type string, "
            "bbox struct<left:int,top:int,right:int,bottom:int,score:double>, "
            "feature array<float>, processed tinyint, failed tinyint, "
            "update_id string",
        )
        updates = spark.createDataFrame(
            self.updates,
            "update_id string, extr_type string, sha1s array<string>, "
            "created timestamp, started timestamp, processed timestamp, "
            "completed boolean",
        )
        return {"images": images, "features": features, "updates": updates}


def generate(n_images: int = 1000, seed: int = SEED) -> DomainFixtures:
    rng = np.random.RandomState(seed)
    t0 = datetime(2024, 1, 10)

    # ---- B1 images -------------------------------------------------------
    formats = rng.choice(
        ["JPEG", "PNG", "GIF", "SVG"], size=n_images, p=[0.80, 0.15, 0.04, 0.01]
    )
    widths = rng.randint(32, 2048, size=n_images)
    heights = rng.randint(32, 2048, size=n_images)
    shas = [_sha1_hex(i) for i in range(n_images)]
    images = pd.DataFrame(
        {
            "sha1": shas,
            "s3_url": [f"https://fixture.local/img/{s}.jpg" for s in shas],
            "img_path": [
                f"/data/imgs/{s[:2]}/{s}.jpg" if rng.rand() < 0.2 else None
                for s in shas
            ],
            "content": [
                fake_image_bytes(f, w, h, hashlib.sha1(s.encode()).digest())
                for f, w, h, s in zip(formats, widths, heights, shas)
            ],
            "format": formats,
            "width": widths,
            "height": heights,
        }
    )

    # ---- B3 updates (24 batches over 6 days, 2 types) --------------------
    n_updates = 24
    upd_rows = []
    per_batch = max(n_images // n_updates, 1)
    for u in range(n_updates):
        extr = "toy_feat_full_image" if u % 2 == 0 else "toy_feat_dlib_face"
        day = t0 + timedelta(days=u // 4)
        seq = u % 4
        uid = f"index_update_{extr}_{day:%Y-%m-%d}_{seq:03d}"
        lo = (u * per_batch) % n_images
        batch = shas[lo : lo + per_batch]
        if u >= 20:  # ~1% cross-batch duplicates (J7/ST4 dedup fodder)
            batch = batch + shas[:2]
        created = day + timedelta(hours=1 + seq)
        if u in (3, 7):  # created-only (F5)
            started, processed, completed = None, None, False
        elif u == 11:  # stale started > 1 h (F6)
            started, processed, completed = created + timedelta(minutes=5), None, False
        elif u == 15:  # processed but incomplete (A9)
            started = created + timedelta(minutes=5)
            processed, completed = started + timedelta(minutes=30), False
        else:
            started = created + timedelta(minutes=5)
            processed, completed = started + timedelta(minutes=30), True
        upd_rows.append(
            {
                "update_id": uid,
                "extr_type": extr,
                "sha1s": batch,
                "created": created,
                "started": started,
                "processed": processed,
                "completed": completed,
            }
        )
    updates = pd.DataFrame(upd_rows)

    # ---- B2 features (full-image on processed updates; faces on 15%) ----
    K_star = 24
    centers_full = rng.randn(K_star, 32)
    centers_full /= np.linalg.norm(centers_full, axis=1, keepdims=True)
    centers_face = rng.randn(K_star, 16)
    centers_face /= np.linalg.norm(centers_face, axis=1, keepdims=True)

    def make_vec(centers: np.ndarray) -> list[float]:
        c = centers[rng.randint(K_star)]
        v = c + 0.05 * rng.randn(centers.shape[1])
        return (v / np.linalg.norm(v)).astype(np.float32).tolist()

    feat_rows = []
    for ui, row in enumerate(upd_rows):
        if row["processed"] is None:
            continue  # unprocessed updates have no features yet
        is_full = row["extr_type"] == "toy_feat_full_image"
        # update 15 is processed-but-incomplete: tail of its batch never
        # produced features (A9 completeness-check fodder)
        batch_shas = row["sha1s"][:-3] if ui == 15 else row["sha1s"]
        for s in batch_shas:
            if rng.rand() < 0.03:  # failed rows (F7 skip_failed fodder)
                feat_rows.append(
                    {
                        "sha1": s,
                        "extr_type": row["extr_type"],
                        "bbox": None,
                        "feature": None,
                        "processed": 0,
                        "failed": 1,
                        "update_id": row["update_id"],
                    }
                )
                continue
            if is_full:
                feat_rows.append(
                    {
                        "sha1": s,
                        "extr_type": row["extr_type"],
                        "bbox": None,
                        "feature": make_vec(centers_full),
                        "processed": 1,
                        "failed": 0,
                        "update_id": row["update_id"],
                    }
                )
            else:
                for _ in range(1 + rng.randint(2)):
                    left, top = int(rng.randint(0, 50)), int(rng.randint(0, 50))
                    feat_rows.append(
                        {
                            "sha1": s,
                            "extr_type": row["extr_type"],
                            "bbox": {
                                "left": left,
                                "top": top,
                                "right": left + int(rng.randint(10, 60)),
                                "bottom": top + int(rng.randint(10, 60)),
                                "score": float(np.round(rng.rand() * 3, 4)),
                            },
                            "feature": make_vec(centers_face),
                            "processed": 1,
                            "failed": 0,
                            "update_id": row["update_id"],
                        }
                    )
    features = pd.DataFrame(feat_rows)
    return DomainFixtures(images=images, features=features, updates=updates)
