// Standalone driver for the REFERENCE linemodLevelup matcher (meiqua/6DPose).
//
// Purpose: produce an apples-to-apples baseline (REFBASELINE.md) by running the
// reference's own C++ matching core on the exact same images/banks as the
// TPU-native framework.  The reference sources are compiled from
// /root/reference/linemodLevelup/ with the Open3D-only poseRefine::process
// stubbed out (see build_reference.sh); everything in this file is new code.
//
// Modes:
//   train  <out_yaml_pattern> <class_id> <num_feats> <T0,T1> <list_file>
//          list_file lines: "<rgb.png> <depth.png> <mask.png>"; adds one
//          template per line (reference contract: addTemplate returns -1 on
//          failure, linemodLevelup.cpp:1943-1975).  Prints one JSON line.
//   detect <yaml_pattern> <class_csv> <num_feats> <T0,T1> <rgb.png> <depth.png>
//          <threshold> <repeats> [top_k]
//          Runs Detector::match() `repeats` times, reports min/median wall
//          time and the top_k matches (default 20) as JSON.
//
// All output is a single JSON object on stdout so the Python harness
// (tools/ref_baseline.py) can consume it directly.

#include "linemodLevelup.h"
#include <opencv2/imgcodecs.hpp>
#include <chrono>
#include <cstdio>
#include <fstream>
#include <iostream>
#include <sstream>
#include <string>
#include <vector>
#include <algorithm>

using namespace std;

static vector<int> parse_T(const string& s) {
    vector<int> out;
    stringstream ss(s);
    string tok;
    while (getline(ss, tok, ',')) out.push_back(stoi(tok));
    return out;
}

static vector<string> parse_csv(const string& s) {
    vector<string> out;
    stringstream ss(s);
    string tok;
    while (getline(ss, tok, ',')) out.push_back(tok);
    return out;
}

static int run_train(int argc, char** argv) {
    if (argc < 7) { fprintf(stderr, "train args missing\n"); return 2; }
    string out_pattern = argv[2];
    string class_id = argv[3];
    int num_feats = stoi(argv[4]);
    vector<int> T = parse_T(argv[5]);
    string list_file = argv[6];

    linemodLevelup::Detector detector(num_feats, T);
    ifstream list(list_file);
    if (!list) { fprintf(stderr, "cannot open %s\n", list_file.c_str()); return 2; }
    string rgb_p, dep_p, mask_p;
    int added = 0, failed = 0, line_no = 0;
    double train_s = 0.0;
    // List-line index of each successfully added template, in template-id
    // order: addTemplate failures shift ids, so downstream pose lookups
    // (template_id -> training view) need the explicit map.
    vector<int> tid_lines;
    while (list >> rgb_p >> dep_p >> mask_p) {
        int line = line_no++;
        cv::Mat rgb = cv::imread(rgb_p, cv::IMREAD_COLOR);
        cv::Mat dep = cv::imread(dep_p, cv::IMREAD_ANYDEPTH);
        cv::Mat mask = cv::imread(mask_p, cv::IMREAD_GRAYSCALE);
        if (rgb.empty() || dep.empty() || mask.empty()) {
            fprintf(stderr, "bad inputs: %s\n", rgb_p.c_str());
            failed++;
            continue;
        }
        vector<cv::Mat> sources{rgb, dep};
        auto t0 = chrono::high_resolution_clock::now();
        int tid = detector.addTemplate(sources, class_id, mask);
        train_s += chrono::duration<double>(chrono::high_resolution_clock::now() - t0).count();
        if (tid < 0) failed++; else { added++; tid_lines.push_back(line); }
    }
    detector.writeClasses(out_pattern);
    ostringstream js;
    js << "{\"mode\":\"train\",\"class_id\":\"" << class_id
       << "\",\"added\":" << added << ",\"failed\":" << failed
       << ",\"train_s\":" << train_s << ",\"tid_lines\":[";
    for (size_t i = 0; i < tid_lines.size(); ++i) {
        if (i) js << ",";
        js << tid_lines[i];
    }
    js << "]}";
    printf("%s\n", js.str().c_str());
    return 0;
}

static int run_detect(int argc, char** argv) {
    if (argc < 10) { fprintf(stderr, "detect args missing\n"); return 2; }
    string yaml_pattern = argv[2];
    vector<string> classes = parse_csv(argv[3]);
    int num_feats = stoi(argv[4]);
    vector<int> T = parse_T(argv[5]);
    string rgb_p = argv[6], dep_p = argv[7];
    float threshold = stof(argv[8]);
    int repeats = stoi(argv[9]);
    int top_k = (argc > 10) ? stoi(argv[10]) : 20;

    linemodLevelup::Detector detector(num_feats, T);
    detector.readClasses(classes, yaml_pattern);

    cv::Mat rgb = cv::imread(rgb_p, cv::IMREAD_COLOR);
    cv::Mat dep = cv::imread(dep_p, cv::IMREAD_ANYDEPTH);
    if (rgb.empty() || dep.empty()) { fprintf(stderr, "bad image inputs\n"); return 2; }
    vector<cv::Mat> sources{rgb, dep};

    vector<linemodLevelup::Match> matches;
    vector<double> times;
    for (int r = 0; r < repeats; ++r) {
        auto t0 = chrono::high_resolution_clock::now();
        matches = detector.match(sources, threshold, classes);
        times.push_back(chrono::duration<double>(
            chrono::high_resolution_clock::now() - t0).count());
    }
    sort(times.begin(), times.end());
    double t_min = times.front();
    double t_med = times[times.size() / 2];

    ostringstream js;
    js << "{\"mode\":\"detect\",\"n_matches\":" << matches.size()
       << ",\"match_time_s_min\":" << t_min
       << ",\"match_time_s_median\":" << t_med
       << ",\"repeats\":" << repeats << ",\"matches\":[";
    int n_out = min<int>(top_k, (int)matches.size());
    for (int i = 0; i < n_out; ++i) {
        const auto& m = matches[i];
        // Level-0 template extent so the harness can compare match
        // CENTERS against ground truth (the reference reports top-left).
        const auto& tp = detector.getTemplates(m.class_id, m.template_id);
        int tw = tp.empty() ? 0 : tp[0].width;
        int th = tp.empty() ? 0 : tp[0].height;
        if (i) js << ",";
        js << "{\"x\":" << m.x << ",\"y\":" << m.y
           << ",\"similarity\":" << m.similarity
           << ",\"class_id\":\"" << m.class_id << "\""
           << ",\"template_id\":" << m.template_id
           << ",\"w\":" << tw << ",\"h\":" << th << "}";
    }
    js << "]}";
    printf("%s\n", js.str().c_str());
    return 0;
}

int main(int argc, char** argv) {
    if (argc < 2) {
        fprintf(stderr, "usage: ref_driver train|detect ...\n");
        return 2;
    }
    string mode = argv[1];
    if (mode == "train") return run_train(argc, argv);
    if (mode == "detect") return run_detect(argc, argv);
    fprintf(stderr, "unknown mode %s\n", mode.c_str());
    return 2;
}
