"""Bundled demo scenes (the reference ships robot_toon + downloaded glTF
scenes, CMakeLists.txt:51-52; we bundle procedural equivalents plus the glTF
loader for external assets)."""
