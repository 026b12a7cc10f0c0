from pmocr_ray.state.manifest import LineageManifest, run_incremental, poll_once  # noqa: F401
