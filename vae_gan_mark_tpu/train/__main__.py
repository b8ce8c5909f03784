"""`python -m vae_gan_mark_tpu.train` — training CLI (see cli.py)."""

from vae_gan_mark_tpu.cli import main

if __name__ == "__main__":
    main()
