"""Command-line drivers mirroring the reference's 7 top-level scripts
(`README.md:48-83`): same names, same flags, same defaults — plus TPU-native
extras (--data_root, --aug_mode, --all_configs sweep mode)."""
