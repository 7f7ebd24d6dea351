{
  "targets": [
    {
      "target_name": "whisper_tpu",
      "sources": ["addon.cc"],
      "include_dirs": ["../../native"],
      "libraries": [
        "-L<(module_root_dir)/../../native",
        "-lwhisper_tpu",
        "-Wl,-rpath,<(module_root_dir)/../../native"
      ],
      "cflags_cc": ["-std=c++17"]
    }
  ]
}
