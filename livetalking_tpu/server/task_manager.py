"""Async avatar-build task manager.

Contract (reference server/task_manager.py:11-139): in-memory task table,
single-worker executor (avatar builds are resource-heavy), task statuses
pending -> running -> completed/failed with 0-100 progress, and a webhook
(``notifyurl``) POSTed on every status transition.
"""

from __future__ import annotations

import threading
import time
import uuid
from concurrent.futures import ThreadPoolExecutor
from typing import Any, Dict, Optional

from livetalking_tpu.utils.logger import logger


class AvatarTask:
    def __init__(self, avatar_id: str, params: Dict[str, Any]):
        self.task_id = str(uuid.uuid4())
        self.avatar_id = avatar_id
        self.params = params
        self.status = "pending"
        self.progress = 0
        self.message = ""
        self.created_at = time.time()
        self.updated_at = self.created_at

    def to_dict(self) -> Dict[str, Any]:
        return {
            "task_id": self.task_id,
            "avatar_id": self.avatar_id,
            "status": self.status,
            "progress": self.progress,
            "message": self.message,
            "created_at": self.created_at,
            "updated_at": self.updated_at,
        }


class TaskManager:
    def __init__(self, model_provider=None):
        self.tasks: Dict[str, AvatarTask] = {}
        self._lock = threading.Lock()
        self._executor = ThreadPoolExecutor(max_workers=1)
        # callable returning the loaded model dict (for VAE params etc.)
        self.model_provider = model_provider

    def add_task(self, avatar_id: str, params: Dict[str, Any]) -> AvatarTask:
        task = AvatarTask(avatar_id, params)
        with self._lock:
            self.tasks[task.task_id] = task
        self._executor.submit(self._run_task, task)
        return task

    def get_task(self, task_id: str) -> Optional[AvatarTask]:
        return self.tasks.get(task_id)

    def list_tasks(self):
        return [t.to_dict() for t in self.tasks.values()]

    def delete_task(self, task_id: str) -> bool:
        with self._lock:
            return self.tasks.pop(task_id, None) is not None

    def _set(self, task: AvatarTask, status: Optional[str] = None,
             progress: Optional[int] = None, message: Optional[str] = None) -> None:
        if status:
            task.status = status
        if progress is not None:
            task.progress = progress
        if message is not None:
            task.message = message
        task.updated_at = time.time()
        self._notify(task)

    def _notify(self, task: AvatarTask) -> None:
        url = task.params.get("notifyurl")
        if not url:
            return
        try:
            import requests

            requests.post(url, json=task.to_dict(), timeout=5)
        except Exception as e:
            logger.warning("task webhook failed: %s", e)

    def _run_task(self, task: AvatarTask) -> None:
        from livetalking_tpu.genavatar import (
            generate_ernerf_avatar,
            generate_musetalk_avatar,
            generate_ultralight_avatar,
            generate_wav2lip_avatar,
        )

        self._set(task, status="running", progress=1, message="started")
        try:
            model_kind = task.params.get("model", "musetalk")
            video_path = task.params["video_path"]
            data_dir = task.params.get("data_dir", "./data")

            def progress(pct: int, msg: str) -> None:
                self._set(task, progress=pct, message=msg)

            # detection backend per task (auto prefers s3fd weights and
            # REFUSES to silently fall back to center boxes)
            from livetalking_tpu.genavatar.face import FaceDetector

            detector = FaceDetector(
                kind=task.params.get("face_detector", "auto"),
                model_path=task.params.get("face_model"),
                models_dir=task.params.get("models_dir", "./models"))

            if model_kind == "wav2lip":
                generate_wav2lip_avatar(
                    video_path, task.avatar_id, data_dir,
                    img_size=int(task.params.get("img_size", 256)),
                    pads=tuple(task.params.get("pads", (0, 10, 0, 0))),
                    face_detector=detector,
                    progress_callback=progress,
                )
            elif model_kind == "ultralight":
                generate_ultralight_avatar(
                    video_path, task.avatar_id, data_dir,
                    unet_checkpoint=task.params.get("unet_checkpoint"),
                    face_detector=detector,
                    models_dir=task.params.get("models_dir", "./models"),
                    progress_callback=progress,
                )
            elif model_kind == "ernerf":
                generate_ernerf_avatar(
                    video_path, task.avatar_id, data_dir,
                    size=int(task.params.get("size", 64)),
                    train_steps=int(task.params.get("train_steps", 200)),
                    face_detector=detector,
                    progress_callback=progress,
                )
            else:
                vae_params = None
                if self.model_provider is not None:
                    model = self.model_provider()
                    vae_params = model.get("vae_params") if model else None
                if vae_params is None:
                    from livetalking_tpu.models import sd_vae
                    import jax

                    logger.warning("building musetalk avatar with random VAE weights")
                    vae_params = sd_vae.init_params(jax.random.PRNGKey(0))
                generate_musetalk_avatar(
                    video_path, task.avatar_id, data_dir,
                    vae_params=vae_params,
                    bbox_shift=int(task.params.get("bbox_shift", 0)),
                    version=task.params.get("version", "v15"),
                    face_detector=detector,
                    models_dir=task.params.get("models_dir", "./models"),
                    progress_callback=progress,
                )
            self._set(task, status="completed", progress=100, message="completed")
        except Exception as e:
            logger.exception("avatar task failed")
            self._set(task, status="failed", message=str(e))


task_manager = TaskManager()
