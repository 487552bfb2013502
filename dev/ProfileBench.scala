// Scratch profiling main — run with: sbt "runMain graft.ProfileBench"
// (kept under dev/ and symlinked/copied into src when needed)
