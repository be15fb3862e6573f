# Model zoo. Import submodules lazily to keep `import foundationstereo_tpu`
# light; the top-level model lives in foundation_stereo.py.
