// Headless driver for the reference vio_360 Estimator.
//
// Feeds a dataset in the repo's synthetic layout (images/ + cam_timestamps.txt
// + imu_data.csv) through Estimator::ProcessFrame (VO or VIO overload, same
// dispatch rule as /root/reference/app/main.cpp:196-212) and writes the
// resulting camera trajectory (Frame::GetTwc translation + quaternion) in TUM
// format, so tools/evaluate_ate.py can score the reference and vio360_tpu on
// identical inputs.
//
// Usage: ref_harness DATASET_DIR CONFIG_YAML OUT_TUM [--vo]
//   --vo : never pass IMU (forces the VO overload on every frame)

#include <algorithm>
#include <chrono>
#include <cstdint>
#include <cstring>
#include <filesystem>
#include <fstream>
#include <iostream>
#include <sstream>
#include <string>
#include <vector>

#include <Eigen/Dense>
#include <opencv2/opencv.hpp>

#include "ConfigUtils.h"
#include "Estimator.h"
#include "Frame.h"
#include "Logger.h"

namespace fs = std::filesystem;

// Minimal .npy loader for the synthetic datasets: 2-D uint8 C-order arrays
// only (the generator writes nothing else). Falls back to cv::imread for
// png/jpg/pgm.
static cv::Mat LoadImageAny(const std::string& path) {
    if (path.size() > 4 && path.compare(path.size() - 4, 4, ".npy") == 0) {
        std::ifstream f(path, std::ios::binary);
        if (!f) return {};
        char magic[6];
        f.read(magic, 6);
        if (std::memcmp(magic, "\x93NUMPY", 6) != 0) return {};
        uint8_t ver[2];
        f.read(reinterpret_cast<char*>(ver), 2);
        uint32_t header_len = 0;
        if (ver[0] == 1) {
            uint16_t hl;
            f.read(reinterpret_cast<char*>(&hl), 2);
            header_len = hl;
        } else {
            f.read(reinterpret_cast<char*>(&header_len), 4);
        }
        std::string header(header_len, '\0');
        f.read(header.data(), header_len);
        bool is_u8 = header.find("'|u1'") != std::string::npos ||
                     header.find("'uint8'") != std::string::npos;
        bool is_f32 = header.find("'<f4'") != std::string::npos;
        if (!is_u8 && !is_f32) return {};
        auto sp = header.find("'shape':");
        auto lp = header.find('(', sp);
        auto rp = header.find(')', lp);
        std::string shape = header.substr(lp + 1, rp - lp - 1);
        int rows = 0, cols = 0;
        if (sscanf(shape.c_str(), "%d , %d", &rows, &cols) != 2 &&
            sscanf(shape.c_str(), "%d, %d", &rows, &cols) != 2)
            return {};
        if (is_u8) {
            cv::Mat img(rows, cols, CV_8UC1);
            f.read(reinterpret_cast<char*>(img.data), size_t(rows) * cols);
            return f ? img : cv::Mat{};
        }
        // float32 in [0,1] (the synthetic generator's format) -> 8-bit gray
        cv::Mat fimg(rows, cols, CV_32FC1);
        f.read(reinterpret_cast<char*>(fimg.data), size_t(rows) * cols * 4);
        if (!f) return {};
        double mx;
        cv::minMaxLoc(fimg, nullptr, &mx);
        cv::Mat img;
        fimg.convertTo(img, CV_8UC1, mx <= 1.5 ? 255.0 : 1.0);
        return img;
    }
    return cv::imread(path, cv::IMREAD_GRAYSCALE);
}

static std::vector<double> LoadTimestamps(const std::string& path) {
    std::vector<double> out;
    std::ifstream f(path);
    for (std::string line; std::getline(f, line);) {
        if (line.empty()) continue;
        try {
            out.push_back(std::stod(line));
        } catch (...) {
        }
    }
    return out;
}

static std::vector<vio_360::IMUData> LoadImu(const std::string& path) {
    std::vector<vio_360::IMUData> out;
    std::ifstream f(path);
    std::string line;
    std::getline(f, line);  // header
    while (std::getline(f, line)) {
        if (line.empty()) continue;
        std::stringstream ss(line);
        std::vector<std::string> tok;
        for (std::string item; std::getline(ss, item, ',');) tok.push_back(item);
        if (tok.size() != 7) continue;
        vio_360::IMUData d;
        d.timestamp = std::stod(tok[0]);
        d.ax = std::stof(tok[1]);
        d.ay = std::stof(tok[2]);
        d.az = std::stof(tok[3]);
        d.gx = std::stof(tok[4]);
        d.gy = std::stof(tok[5]);
        d.gz = std::stof(tok[6]);
        out.push_back(d);
    }
    return out;
}

static std::vector<std::string> ListImages(const std::string& dir) {
    std::vector<std::string> files;
    for (const auto& e : fs::directory_iterator(dir)) {
        if (!e.is_regular_file()) continue;
        std::string ext = e.path().extension().string();
        if (ext == ".jpg" || ext == ".jpeg" || ext == ".png" || ext == ".pgm" ||
            ext == ".npy")
            files.push_back(e.path().string());
    }
    std::sort(files.begin(), files.end());
    return files;
}

int main(int argc, char** argv) {
    if (argc < 4) {
        std::cerr << "usage: ref_harness DATASET_DIR CONFIG_YAML OUT_TUM [--vo]\n";
        return 2;
    }
    const std::string dataset = argv[1], config_path = argv[2], out_tum = argv[3];
    bool force_vo = false;
    for (int i = 4; i < argc; ++i)
        if (std::string(argv[i]) == "--vo") force_vo = true;

    vio_360::Logger::Init();
    auto& config = vio_360::ConfigUtils::GetInstance();
    if (!config.Load(config_path)) {
        std::cerr << "failed to load config " << config_path << "\n";
        return 2;
    }

    auto stamps = LoadTimestamps(dataset + "/cam_timestamps.txt");
    auto imu_all = LoadImu(dataset + "/imu_data.csv");
    auto images = ListImages(dataset + "/images");
    if (stamps.empty() || images.empty()) {
        std::cerr << "empty dataset at " << dataset << "\n";
        return 2;
    }
    const size_t n = std::min(stamps.size(), images.size());

    auto estimator = std::make_unique<vio_360::Estimator>();
    double prev_t = 0.0;
    double wall_ms = 0.0;
    size_t processed = 0;

    for (size_t i = 0; i < n; ++i) {
        cv::Mat img = LoadImageAny(images[i]);
        if (img.empty()) continue;
        if (img.cols != config.camera_width || img.rows != config.camera_height)
            cv::resize(img, img,
                       cv::Size(config.camera_width, config.camera_height), 0, 0,
                       cv::INTER_AREA);

        std::vector<vio_360::IMUData> frame_imu;
        if (!force_vo && i > 0)
            for (const auto& d : imu_all)
                if (d.timestamp >= prev_t && d.timestamp < stamps[i])
                    frame_imu.push_back(d);

        auto t0 = std::chrono::steady_clock::now();
        vio_360::Estimator::EstimationResult res;
        if (!frame_imu.empty())
            res = estimator->ProcessFrame(img, stamps[i], frame_imu);
        else
            res = estimator->ProcessFrame(img, stamps[i]);
        wall_ms += std::chrono::duration<double, std::milli>(
                       std::chrono::steady_clock::now() - t0)
                       .count();
        if (std::getenv("REF_HARNESS_VERBOSE"))
            std::cerr << "frame " << i << " tracked=" << res.num_tracked
                      << " inliers=" << res.num_inliers
                      << " feats=" << res.num_features
                      << " init=" << (estimator->IsInitialized() ? 1 : 0)
                      << "\n";
        ++processed;
        prev_t = stamps[i];
    }

    std::ofstream out(out_tum);
    out.precision(9);
    size_t written = 0;
    for (const auto& frame : estimator->GetAllFrames()) {
        Eigen::Matrix4f Twc = frame->GetTwc();
        Eigen::Quaternionf q(Twc.block<3, 3>(0, 0));
        q.normalize();
        out << std::fixed << frame->GetTimestamp() * 1e-9 << " " << Twc(0, 3)
            << " " << Twc(1, 3) << " " << Twc(2, 3) << " " << q.x() << " "
            << q.y() << " " << q.z() << " " << q.w() << "\n";
        ++written;
    }

    std::cerr << "ref_harness: frames=" << processed << " poses=" << written
              << " initialized=" << (estimator->IsInitialized() ? 1 : 0)
              << " imu_initialized=" << (estimator->IsIMUInitialized() ? 1 : 0)
              << " keyframes=" << estimator->GetAllKeyframes().size()
              << " total_ms=" << wall_ms
              << " ms_per_frame=" << (processed ? wall_ms / processed : 0.0)
              << "\n";
    return 0;
}
