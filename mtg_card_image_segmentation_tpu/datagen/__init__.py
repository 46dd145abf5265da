"""Dataset generation: scrapers for real card/HDRI/background assets
(network-gated), the crash-tolerant watchdog, and the disk materializer for
the on-device synthetic renderer (data/synthetic.py) — together replacing
the reference's dataset_generator/ pipeline (Scryfall + Polyhaven +
BlenderProc + Lorem Picsum)."""
