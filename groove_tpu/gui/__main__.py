from groove_tpu.gui.tui import main

if __name__ == "__main__":
    raise SystemExit(main())
